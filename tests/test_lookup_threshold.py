"""Threshold-mode lookup: exactness incl. the rare undecided-lane fallback.

The coarse 16-bit compare decides a lane only when its draw payload top-16
differs from the stored threshold; equality (~2^-15 per lane-step) must take
the exact f32 fallback sweep.  Random tests almost never hit it, so bits are
engineered here to sit exactly on the boundary.

The lookup closure indexes its table refs with ``ref[c, :]`` which works on
plain jnp arrays too, so it is tested directly under jit on CPU — the same
code the Mosaic kernel runs (ops/pallas/push_mcc.py make_chunked_lookup).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from particle_simulation_tpu import rng
from particle_simulation_tpu.cross_section import N_STEPS, energy_to_index, load_table
from particle_simulation_tpu.ops.pallas.push_mcc import (
    LANES,
    _POLY_PAD,
    _exact_threshold,
    _pad_tables,
    chunk_bound,
    make_chunked_lookup,
    pack_poly_thresholds,
    pack_threshold_full,
    pack_threshold_table,
)


def _mk_table(seed=7, n=10000, spike=100.0):
    rs = np.random.default_rng(seed)
    t = np.zeros((n, 2), np.float32)
    t[:, 0] = rs.uniform(0, 0.3, n)
    t[:, 1] = rs.uniform(0, 0.7, n)
    t[::131, 0] = spike
    t[::97, 1] = 0.0
    return jnp.asarray(t)


@pytest.mark.parametrize(
    "mode,hits",
    [("threshold", False), ("needband", False), ("band0", False),
     ("minmax", False), ("pipeband", False), ("statichybrid", False),
     ("staticthresh", False), ("staticguard", False),
     # merged tail: escapees (static_chunks=3 forces many) join the exact
     # f32 tie sweep — one reduction pair per step
     ("staticthresh_m", False), ("staticthresh_m", True),
     # full-24-bit threshold compare: exact with no tie fallback at all
     ("staticfull", False), ("staticfull", True),
     ("staticfull2", False), ("staticfull2", True),
     # boolean return protocol (lookup_hits=True): same outcomes, decided
     # booleans instead of f32 pseudo-chances
     ("threshold", True), ("staticthresh", True), ("staticguard", True),
     # polynomial-fit thresholds: the random table fits NO chunk, so every
     # non-chunk-0 lane takes the NaN-poisoned undecided path (the exact
     # f32 fallback); chunk-0 lanes take the coarse 16-bit protocol
     ("polythresh", False), ("polythresh", True)],
)
def test_lookup_modes_preserve_outcomes(mode, hits):
    _check_lookup_outcomes(mode, hits)


@pytest.mark.parametrize("hits", [False, True])
def test_polythresh_pack_preserves_outcomes(hits):
    """lookup_poly_pack (bf16-packed coefficient row): the random table
    fits no chunk, so the NaN halves must widen back to NaN and poison
    every non-chunk-0 lane into the exact fallback; chunk-0 flows through
    the exact row + measured margins as usual.  Outcomes identical."""
    _check_lookup_outcomes("polythresh", hits, poly_pack=True)
    _check_lookup_outcomes("polythresh", hits, poly_pack=True,
                           cand_gate=True, table=_mk_table(spike=60.0))


@pytest.mark.parametrize("hits", [False, True])
def test_polythresh_cand_gate_preserves_outcomes(hits):
    """lookup_cand_gate: non-candidate lanes (p24 >= global max total
    threshold) are dropped from the fallback set — outcomes must be
    identical.  The random table fits no chunk, so WITHOUT the gate every
    non-chunk-0 lane is NaN-undecided; with it, only live candidates fall
    back.  The default _mk_table's 100.0 spikes push the global max total
    threshold to exactly 2^24, which makes p24 < pmax vacuously true and
    the gate a no-op — so this test caps the table at 60.0 (pmax ≈
    0.6·2^24), asserts a healthy fraction of lanes is really excluded,
    and pins one lane to p24 == pmax exactly (the >= boundary of the
    gate compare itself)."""
    table = _mk_table(spike=60.0)
    aux_np = np.asarray(pack_poly_thresholds(table))
    pmax = int(aux_np[4 + 3][0])  # row degree+3: global max total threshold
    assert pmax < (1 << 24), "gate would be vacuous (table total >= 100)"

    def patch(bits, idx):
        # one whole row exactly ON the gate boundary: p24 == pmax must be
        # excluded (>=) and still produce the exact no-event outcome
        bits[7] = (np.uint32(pmax) << np.uint32(8)) | (bits[7] & np.uint32(0xFF))
        p24 = bits >> np.uint32(8)
        excluded = (p24.astype(np.int64) >= pmax).mean()
        assert excluded > 0.1, f"gate never active ({excluded:.0%} excluded)"
        return bits

    _check_lookup_outcomes("polythresh", hits, cand_gate=True, table=table,
                           patch_bits=patch)


@pytest.mark.parametrize("mode", ["staticthresh", "staticthresh_m"])
@pytest.mark.parametrize("waves", [2, 3, 8])
def test_tail_waves_preserve_outcomes(mode, waves):
    """Wave-unrolled tail sweeps: the static_chunks=3 escapee band spans
    dozens of chunks, so every wave width exercises multi-wave trips AND
    the padding visits past the sweep max (which must select nothing)."""
    _check_lookup_outcomes(mode, hits=False, tail_waves=waves)


def _check_lookup_outcomes(mode, hits, tail_waves=0, cand_gate=False,
                           table=None, patch_bits=None, poly_pack=False,
                           margin_fold=False):
    if table is None:
        table = _mk_table()
    split2d, remove2d, n_chunks = _pad_tables(table)
    aux = (
        pack_threshold_full(table)
        if mode in ("staticfull", "staticfull2")
        else pack_poly_thresholds(table, degree=2 if poly_pack else 4,
                                  pack_bf16=poly_pack,
                                  fold_margin=margin_fold)
        if mode == "polythresh"
        else pack_threshold_table(table)
        if mode in ("threshold", "staticthresh", "staticthresh_m",
                    "staticguard")
        else chunk_bound(table)
    )
    # static_chunks=3 << the 79-chunk table forces the dynamic tail path
    lookup = make_chunked_lookup(n_chunks, mode, static_chunks=3, hits=hits,
                                 tail_waves=tail_waves, cand_gate=cand_gate,
                                 poly_degree=2 if poly_pack else 4,
                                 poly_pack=poly_pack,
                                 margin_fold=margin_fold)

    # energies spread over the whole table; (8, 128) tile
    rs = np.random.default_rng(3)
    shape = (8, LANES)
    idx = rs.integers(0, 10000, shape)
    # bucket-center energies (inverse of the log-bucket formula)
    energy = np.power(10.0, 22.0 * (idx + 0.5) / N_STEPS - 6.0).astype(
        np.float32
    )
    # engineered bits: half random, half exactly on the stored 16-bit
    # threshold boundary (forces the undecided fallback)
    packed = np.asarray(pack_threshold_table(table)).reshape(-1)
    ts8 = (packed[idx].astype(np.int64) >> 16) & 0xFFFF
    tt8 = packed[idx].astype(np.int64) & 0xFFFF
    bits = rs.integers(0, 1 << 32, shape, dtype=np.uint64).astype(np.uint32)
    force_s = rs.random(shape) < 0.25
    force_t = ~force_s & (rs.random(shape) < 0.33)
    bits = np.where(force_s, (ts8 << 16).astype(np.uint32) | (bits & 0xFFFF), bits)
    bits = np.where(force_t, (tt8 << 16).astype(np.uint32) | (bits & 0xFFFF), bits)
    if patch_bits is not None:
        bits = patch_bits(bits, idx)
    u = np.asarray(rng.uniform_from_bits(jnp.asarray(bits), 0.0, 100.0))

    band = ()
    if mode == "pipeband":
        hi_np = idx // 128
        nz = hi_np > 0
        band = (
            jnp.int32(np.where(nz, hi_np, n_chunks - 1).min()),
            jnp.int32(np.where(nz, hi_np, 1).max()),
        )

    @jax.jit
    def run(energy, u, bits):
        if mode == "pipeband":
            return lookup(split2d, remove2d, aux, energy, u, bits, band=band)
        return lookup(split2d, remove2d, aux, energy, u, bits)

    sp, rm = run(
        jnp.asarray(energy, jnp.float32), jnp.asarray(u), jnp.asarray(bits)
    )
    sp, rm = np.asarray(sp), np.asarray(rm)

    table_np = np.asarray(table)
    # the lookup's index derivation must match energy_to_index
    idx2 = np.asarray(energy_to_index(jnp.asarray(energy, jnp.float32)))
    np.testing.assert_array_equal(idx, idx2)
    split_true = table_np[idx, 0]
    tot_true = table_np[idx, 0] + table_np[idx, 1]
    if hits:
        assert lookup.returns_hits
        assert sp.dtype == np.bool_ and rm.dtype == np.bool_
        np.testing.assert_array_equal(sp, u < split_true)
        np.testing.assert_array_equal(rm, u < tot_true)
        return
    # contract: comparison OUTCOMES are preserved, not the raw values
    np.testing.assert_array_equal(u < sp, u < split_true)
    np.testing.assert_array_equal(u < sp + rm, u < tot_true)


def _poly_fit_mirror(aux_np, degree, idx):
    """Numpy mirror of the kernel's polythresh evaluation for bucket idx:
    returns (T_hat f32 value — Horner, or the exact row for chunk 0 —
    per-bucket delta_s, delta_t, chunk0 exact f32 row)."""
    hi = idx // LANES
    lo = idx % LANES
    rows_f = aux_np[: degree + 1].view(np.float32)
    exact0 = aux_np[degree + 2].view(np.float32)
    xs = ((lo.astype(np.float32) - np.float32(63.5))
          * np.float32(1.0 / 63.5))
    val = rows_f[0][hi]
    for k in range(1, degree + 1):
        val = (val * xs + rows_f[k][hi]).astype(np.float32)
    val = np.where(hi == 0, exact0[lo], val)
    mg = aux_np[degree + 1][hi]
    dls = ((mg >> 16) & 0xFFFF).astype(np.float32)
    dlt = (mg & 0xFFFF).astype(np.float32)
    return val, dls, dlt, exact0


def test_poly_margins_are_sound():
    """The polythresh exactness proof: for every bucket of every FITTED
    chunk, the f32 Horner evaluation sits within delta_s of the exact
    24-bit split threshold (and 2*Horner within delta_t of the total one),
    with the +-_POLY_PAD headroom to spare for cross-lowering drift.
    Unfitted chunks must be NaN-poisoned (never decided).  Checked
    exhaustively over all 10000 buckets of the bundled sine table."""
    degree = 4
    table = jnp.asarray(load_table())
    aux_np = np.asarray(pack_poly_thresholds(table, degree))
    ts = np.asarray(_exact_threshold(table[:, 0].astype(jnp.float32)))
    tt = np.asarray(
        _exact_threshold(
            table[:, 0].astype(jnp.float32) + table[:, 1].astype(jnp.float32)
        )
    )
    idx = np.arange(10000)
    val, dls, dlt, exact0 = _poly_fit_mirror(aux_np, degree, idx)
    decided = ~np.isnan(val)
    # chunk 0 must be EXACT (its f32 row substitutes for the unfittable
    # fit), and a healthy prefix of chunks must fit
    np.testing.assert_array_equal(val[:LANES], ts[:LANES].astype(np.float32))
    n_fit_chunks = decided[LANES:].sum() // LANES
    assert n_fit_chunks >= 10, f"only {n_fit_chunks} fitted chunks"
    assert decided[LANES:].sum() == n_fit_chunks * LANES, (
        "fitted region not a prefix"
    )
    # the sound-margin property, PER BUCKET, with the pad as headroom
    err_s = np.abs(val[decided] - ts[decided])
    err_t = np.abs(2.0 * val[decided] - tt[decided])
    assert np.all(err_s <= dls[decided] - _POLY_PAD / 2)
    assert np.all(err_t <= dlt[decided] - _POLY_PAD / 2)
    # the low-energy chunks the population lives in must carry TIGHT
    # margins (the r3i v1 lesson: a global margin made the fallback sweep
    # fire every step) — chunk 0 is exact, chunks 1..8 fit to err <= 8
    low = idx < 9 * LANES
    assert dls[low].max() <= 24.0
    assert dlt[low].max() <= 48.0
    # the candidate-gate bound (row degree+3) must be the global max total
    # threshold: together with sound margins this proves the gate exact
    # (p24 >= bound  =>  p24 >= T_t(c) >= T_s(c) and the raw compares,
    # val - delta <= T by soundness, already say "no event")
    np.testing.assert_array_equal(aux_np[degree + 3], tt.max())


def _poly_pack_mirror(aux_np, idx):
    """Numpy mirror of the PACKED polythresh evaluation (lookup_poly_pack):
    row 0 carries bf16(a2)|bf16(a1) as 16-bit halves, row 1 = a0 f32,
    row 2 = margins, row 3 = chunk-0 exact row."""
    hi = idx // LANES
    lo = idx % LANES
    pk = aux_np[0][hi]
    c2 = (pk & np.int32(-65536)).view(np.float32)
    c1 = (pk << 16).view(np.float32)
    a0 = aux_np[1].view(np.float32)[hi]
    exact0 = aux_np[3].view(np.float32)
    xs = ((lo.astype(np.float32) - np.float32(63.5))
          * np.float32(1.0 / 63.5))
    val = ((c2 * xs).astype(np.float32) + c1).astype(np.float32)
    val = ((val * xs).astype(np.float32) + a0).astype(np.float32)
    val = np.where(hi == 0, exact0[lo], val)
    mg = aux_np[2][hi]
    dls = ((mg >> 16) & 0xFFFF).astype(np.float32)
    dlt = (mg & 0xFFFF).astype(np.float32)
    return val, dls, dlt, exact0


def test_poly_pack_margins_are_sound():
    """The packed-coefficient exactness proof: the bf16-rounded Horner
    value reconstructed from the 16-bit halves sits within the measured
    margins of the exact 24-bit thresholds for every fitted bucket, with
    the pad to spare; unfitted chunks stay NaN; the fitted window must
    not collapse vs the unpacked degree-2 fit; the candidate bound (row
    4) is still the global max total threshold."""
    table = jnp.asarray(load_table())
    aux_np = np.asarray(pack_poly_thresholds(table, 2, pack_bf16=True))
    ts = np.asarray(_exact_threshold(table[:, 0].astype(jnp.float32)))
    tt = np.asarray(
        _exact_threshold(
            table[:, 0].astype(jnp.float32) + table[:, 1].astype(jnp.float32)
        )
    )
    idx = np.arange(10000)
    val, dls, dlt, _ = _poly_pack_mirror(aux_np, idx)
    decided = ~np.isnan(val)
    np.testing.assert_array_equal(val[:LANES], ts[:LANES].astype(np.float32))
    n_fit = decided[LANES:].sum() // LANES
    # unpacked deg2 fits chunks 1..10; bf16 rounding must not lose any
    aux_f32 = np.asarray(pack_poly_thresholds(table, 2))
    val_f32 = _poly_fit_mirror(aux_f32, 2, idx)[0]
    assert n_fit * LANES == (~np.isnan(val_f32))[LANES:].sum()
    err_s = np.abs(val[decided] - ts[decided])
    err_t = np.abs(2.0 * val[decided] - tt[decided])
    assert np.all(err_s <= dls[decided] - _POLY_PAD / 2)
    assert np.all(err_t <= dlt[decided] - _POLY_PAD / 2)
    np.testing.assert_array_equal(aux_np[4], tt.max())


@pytest.mark.parametrize("hits", [False, True])
def test_polythresh_pack_decided_and_margin_lanes(hits):
    """Packed-coefficient variant of the decided/margin-lane test: lanes
    engineered just inside and outside the (bf16-widened) margins around
    both thresholds, plus chunk-0 and escapee lanes — every decided path
    and the fallback must reproduce the exact f32 outcomes."""
    table = jnp.asarray(load_table())
    split2d, remove2d, n_chunks = _pad_tables(table)
    aux = pack_poly_thresholds(table, 2, pack_bf16=True)
    lookup = make_chunked_lookup(n_chunks, "polythresh", hits=hits,
                                 poly_degree=2, poly_pack=True)

    rs = np.random.default_rng(13)
    shape = (8, LANES)
    aux_np = np.asarray(aux)
    idx = rs.integers(0, 10000, shape)
    idx[0] = rs.integers(0, LANES, LANES)                    # chunk 0
    idx[1:5] = rs.integers(LANES, 11 * LANES, (4, LANES))    # fitted-ish
    energy = np.power(10.0, 22.0 * (idx + 0.5) / N_STEPS - 6.0).astype(
        np.float32
    )
    val, dls, dlt, _ = _poly_pack_mirror(aux_np, idx.reshape(-1))
    val = val.reshape(shape)
    t_hat = np.where(np.isnan(val), 8 << 20, val).astype(np.int64)
    off = rs.integers(-3000, 3000, shape)
    p24 = np.clip(t_hat + off, 0, (1 << 24) - 1).astype(np.uint32)
    low8 = rs.integers(0, 256, shape, dtype=np.uint64).astype(np.uint32)
    bits = (p24 << np.uint32(8)) | low8
    u = np.asarray(rng.uniform_from_bits(jnp.asarray(bits), 0.0, 100.0))

    sp, rm = jax.jit(
        lambda e, uu, b: lookup(split2d, remove2d, aux, e, uu, b)
    )(jnp.asarray(energy), jnp.asarray(u), jnp.asarray(bits))
    sp, rm = np.asarray(sp), np.asarray(rm)

    tn = np.asarray(table)
    split_true = tn[idx, 0]
    tot_true = tn[idx, 0].astype(np.float32) + tn[idx, 1].astype(np.float32)
    if hits:
        np.testing.assert_array_equal(sp, u < split_true)
        np.testing.assert_array_equal(rm, u < tot_true)
    else:
        np.testing.assert_array_equal(u < sp, u < split_true)
        np.testing.assert_array_equal(u < sp + rm, u < tot_true)


def _poly_fold_mirror(aux_np, idx):
    """Numpy mirror of the FOLDED polythresh evaluation
    (lookup_margin_fold): row 0 = bf16 pair, row 1 = (a0q << 8) |
    margin_exp, row 2 = chunk-0 exact row, row 3 = candidate bound."""
    hi = idx // LANES
    lo = idx % LANES
    pk = aux_np[0][hi]
    c2 = (pk & np.int32(-65536)).view(np.float32)
    c1 = (pk << 16).view(np.float32)
    am = aux_np[1][hi]
    a0 = ((am >> 8).astype(np.float32) * np.float32(4.0)
          - np.float32(2097152.0)).astype(np.float32)
    delta = ((am & 0xFF) << 23).astype(np.int32).view(np.float32)
    exact0 = aux_np[2].view(np.float32)
    xs = ((lo.astype(np.float32) - np.float32(63.5))
          * np.float32(1.0 / 63.5))
    val = ((c2 * xs).astype(np.float32) + c1).astype(np.float32)
    val = ((val * xs).astype(np.float32) + a0).astype(np.float32)
    val = np.where(hi == 0, exact0[lo], val)
    return val, delta, exact0


def test_poly_fold_margins_are_sound():
    """The margin-fold exactness proof (lookup_margin_fold, the round-5
    gather rung): the Horner value rebuilt from the bf16 pair + 23-bit
    quantized a0 sits within the SHARED power-of-two margin of the exact
    24-bit split threshold (and 2*value within it of the total one) for
    every fitted bucket; unfitted chunks stay NaN; the fitted window must
    not collapse vs the 4-gather pack; the candidate bound (row 3) is
    still the global max total threshold.  Exhaustive over all 10000
    buckets of the bundled sine table."""
    table = jnp.asarray(load_table())
    aux_np = np.asarray(
        pack_poly_thresholds(table, 2, pack_bf16=True, fold_margin=True)
    )
    ts = np.asarray(_exact_threshold(table[:, 0].astype(jnp.float32)))
    tt = np.asarray(
        _exact_threshold(
            table[:, 0].astype(jnp.float32) + table[:, 1].astype(jnp.float32)
        )
    )
    idx = np.arange(10000)
    val, delta, _ = _poly_fold_mirror(aux_np, idx)
    decided = ~np.isnan(val)
    np.testing.assert_array_equal(val[:LANES], ts[:LANES].astype(np.float32))
    # the fold must not shrink the fitted window vs the 4-gather pack
    aux_pk = np.asarray(pack_poly_thresholds(table, 2, pack_bf16=True))
    val_pk = _poly_pack_mirror(aux_pk, idx)[0]
    assert decided.sum() == (~np.isnan(val_pk)).sum()
    # sound shared margins, per bucket, with headroom to spare
    err_s = np.abs(val[decided] - ts[decided])
    err_t = np.abs(2.0 * val[decided] - tt[decided])
    assert np.all(err_s <= delta[decided] - _POLY_PAD / 2)
    assert np.all(err_t <= delta[decided] - _POLY_PAD / 2)
    # deltas are exact powers of two (the exponent-byte encoding)
    d = delta[decided]
    assert np.all(d == np.exp2(np.round(np.log2(d))))
    # bounded blowup vs the 4-gather pack: the shared power-of-two delta
    # is at most 2x the pack's larger margin plus the a0-quantization pad
    # (pow2ceil(x) < 2x), chunk by chunk
    mg = aux_pk[2]
    pack_worst = np.maximum((mg >> 16) & 0xFFFF, mg & 0xFFFF).astype(
        np.float32
    )
    hi = idx // LANES
    ok = decided & (hi > 0)
    assert np.all(delta[ok] <= 2.0 * (pack_worst[hi] + 16.0)[ok])
    # chunk 0 (the E=0 attractor) keeps a tight margin
    assert delta[:LANES].max() <= 64.0
    np.testing.assert_array_equal(aux_np[3], tt.max())


@pytest.mark.parametrize("fit", ["lsq", "minimax"])
def test_poly_wide_cap_margins_are_sound(fit):
    """The round-5 window extension (lookup_poly_err_cap): raising the fit
    cap to the 16-bit margin ceiling must (a) extend the sine table's
    fitted window past chunk 20, (b) keep every margin representable
    (never clipped — a clipped margin would be unsound), and (c) keep the
    per-bucket soundness property with the pad to spare.  Parametrized
    over the fit objective: the Lawson minimax fit must satisfy the same
    soundness (margins are measured, not modeled, for any fit)."""
    table = jnp.asarray(load_table())
    aux_np = np.asarray(
        pack_poly_thresholds(table, 2, pack_bf16=True, err_cap=60000.0,
                             fit=fit)
    )
    ts = np.asarray(_exact_threshold(table[:, 0].astype(jnp.float32)))
    tt = np.asarray(
        _exact_threshold(
            table[:, 0].astype(jnp.float32) + table[:, 1].astype(jnp.float32)
        )
    )
    idx = np.arange(10000)
    val, dls, dlt, _ = _poly_pack_mirror(aux_np, idx)
    decided = ~np.isnan(val)
    n_fit = decided[LANES:].sum() // LANES
    assert n_fit >= 20, f"window did not extend ({n_fit} chunks)"
    assert decided[LANES:].sum() == n_fit * LANES, "fitted region not a prefix"
    # representability: margins below the 16-bit field, strictly (no clip)
    assert dls[decided].max() < 0xFFFF and dlt[decided].max() < 0xFFFF
    # soundness per bucket with headroom
    err_s = np.abs(val[decided] - ts[decided])
    err_t = np.abs(2.0 * val[decided] - tt[decided])
    assert np.all(err_s <= dls[decided] - _POLY_PAD / 2)
    assert np.all(err_t <= dlt[decided] - _POLY_PAD / 2)
    # the low chunks must KEEP their tight per-chunk margins (the window
    # extension must not fatten the band the population starts in)
    aux_base = np.asarray(pack_poly_thresholds(table, 2, pack_bf16=True))
    if fit == "lsq":
        np.testing.assert_array_equal(aux_np[2][:11], aux_base[2][:11])
    else:
        # minimax: margins must improve in AGGREGATE over LSQ (per chunk
        # they may wiggle a few counts — Lawson equalizes the residual)
        base_mg = aux_base[2][1:11]
        mg = aux_np[2][1:11]
        for shift in (16, 0):
            b = (base_mg >> shift) & 0xFFFF
            m = (mg >> shift) & 0xFFFF
            assert m.sum() < b.sum() and m.max() <= b.max(), (shift, m, b)


@pytest.mark.parametrize("hits", [False, True])
def test_polythresh_fold_preserves_outcomes(hits):
    """lookup_margin_fold end-to-end through the lookup: the random table
    fits no chunk (all-NaN fallback), and the spiky 60-capped table
    exercises the candidate gate on the folded layout."""
    _check_lookup_outcomes("polythresh", hits, poly_pack=True,
                           margin_fold=True)
    _check_lookup_outcomes("polythresh", hits, poly_pack=True,
                           margin_fold=True, cand_gate=True,
                           table=_mk_table(spike=60.0))


@pytest.mark.parametrize("hits", [False, True])
def test_polythresh_fold_decided_and_margin_lanes(hits):
    """Folded-layout variant of the decided/margin-lane test: payloads
    engineered just inside and outside the shared margin around both
    thresholds, plus chunk-0 and escapee lanes — every decided path and
    the fallback must reproduce the exact f32 outcomes."""
    table = jnp.asarray(load_table())
    split2d, remove2d, n_chunks = _pad_tables(table)
    aux = pack_poly_thresholds(table, 2, pack_bf16=True, fold_margin=True)
    lookup = make_chunked_lookup(n_chunks, "polythresh", hits=hits,
                                 poly_degree=2, poly_pack=True,
                                 margin_fold=True)

    rs = np.random.default_rng(17)
    shape = (8, LANES)
    aux_np = np.asarray(aux)
    idx = rs.integers(0, 10000, shape)
    idx[0] = rs.integers(0, LANES, LANES)                    # chunk 0
    idx[1:5] = rs.integers(LANES, 11 * LANES, (4, LANES))    # fitted-ish
    energy = np.power(10.0, 22.0 * (idx + 0.5) / N_STEPS - 6.0).astype(
        np.float32
    )
    val, delta, _ = _poly_fold_mirror(aux_np, idx.reshape(-1))
    val = val.reshape(shape)
    t_hat = np.where(np.isnan(val), 8 << 20, val).astype(np.int64)
    off = rs.integers(-3000, 3000, shape)
    p24 = np.clip(t_hat + off, 0, (1 << 24) - 1).astype(np.uint32)
    low8 = rs.integers(0, 256, shape, dtype=np.uint64).astype(np.uint32)
    bits = (p24 << np.uint32(8)) | low8
    u = np.asarray(rng.uniform_from_bits(jnp.asarray(bits), 0.0, 100.0))

    sp, rm = jax.jit(
        lambda e, uu, b: lookup(split2d, remove2d, aux, e, uu, b)
    )(jnp.asarray(energy), jnp.asarray(u), jnp.asarray(bits))
    sp, rm = np.asarray(sp), np.asarray(rm)

    tn = np.asarray(table)
    split_true = tn[idx, 0]
    tot_true = tn[idx, 0].astype(np.float32) + tn[idx, 1].astype(np.float32)
    if hits:
        np.testing.assert_array_equal(sp, u < split_true)
        np.testing.assert_array_equal(rm, u < tot_true)
    else:
        np.testing.assert_array_equal(u < sp, u < split_true)
        np.testing.assert_array_equal(u < sp + rm, u < tot_true)


@pytest.mark.parametrize("hits", [False, True])
@pytest.mark.parametrize("degree", [4, 5])
def test_polythresh_decided_and_margin_lanes(hits, degree):
    """polythresh on the bundled sine table: lanes engineered to sit just
    INSIDE and just OUTSIDE the fit margin around both thresholds, plus
    chunk-0 and escapee lanes — every decided path and the fallback must
    reproduce the exact f32 comparison outcomes."""
    table = jnp.asarray(load_table())
    split2d, remove2d, n_chunks = _pad_tables(table)
    aux = pack_poly_thresholds(table, degree)
    lookup = make_chunked_lookup(n_chunks, "polythresh", hits=hits,
                                 poly_degree=degree)

    rs = np.random.default_rng(11)
    shape = (8, LANES)
    aux_np = np.asarray(aux)
    # bucket mix: chunk 0, fitted chunks, far escapees
    idx = rs.integers(0, 10000, shape)
    idx[0] = rs.integers(0, LANES, LANES)                    # chunk 0
    idx[1:5] = rs.integers(LANES, 15 * LANES, (4, LANES))    # fitted-ish
    energy = np.power(10.0, 22.0 * (idx + 0.5) / N_STEPS - 6.0).astype(
        np.float32
    )
    val, dls, dlt, _ = _poly_fit_mirror(aux_np, degree, idx.reshape(-1))
    val = val.reshape(shape)
    # payloads around the fitted threshold: inside the margin (undecided),
    # just outside (decided hit/miss), random elsewhere
    t_hat = np.where(np.isnan(val), 8 << 20, val).astype(np.int64)
    off = rs.integers(-3000, 3000, shape)
    p24 = np.clip(t_hat + off, 0, (1 << 24) - 1).astype(np.uint32)
    low8 = rs.integers(0, 256, shape, dtype=np.uint64).astype(np.uint32)
    bits = (p24 << np.uint32(8)) | low8
    u = np.asarray(rng.uniform_from_bits(jnp.asarray(bits), 0.0, 100.0))

    sp, rm = jax.jit(
        lambda e, uu, b: lookup(split2d, remove2d, aux, e, uu, b)
    )(jnp.asarray(energy), jnp.asarray(u), jnp.asarray(bits))
    sp, rm = np.asarray(sp), np.asarray(rm)

    tn = np.asarray(table)
    split_true = tn[idx, 0]
    tot_true = tn[idx, 0].astype(np.float32) + tn[idx, 1].astype(np.float32)
    if hits:
        np.testing.assert_array_equal(sp, u < split_true)
        np.testing.assert_array_equal(rm, u < tot_true)
    else:
        np.testing.assert_array_equal(u < sp, u < split_true)
        np.testing.assert_array_equal(u < sp + rm, u < tot_true)


def test_forced_boundary_bits_hit_fallback():
    """Sanity: the engineered bits above actually create undecided lanes."""
    table = _mk_table()
    packed = np.asarray(pack_threshold_table(table)).reshape(-1)
    rs = np.random.default_rng(3)
    idx = rs.integers(0, 10000, (8, LANES))
    ts8 = (packed[idx].astype(np.int64) >> 16) & 0xFFFF
    bits = (ts8 << 16).astype(np.uint32)
    p8 = (bits >> np.uint32(16)).astype(np.int64)
    assert np.all(p8 == ts8)
