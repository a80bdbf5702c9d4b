"""Fused Pallas push+MCC engine — the ``dynamic`` scheduler.

The reference's headline contribution is its Dynamic persistent-kernel
scheduler: keep the entire ``poisson_timestep``-long mobility phase inside
one kernel launch, with newly ionized electrons buffered in shared memory
and published to global memory via atomics+fences (src/pic.cu:19-211).  This
module is its TPU-native counterpart:

  * one ``pallas_call`` runs a particle tile through ALL T mobility steps
    while the tile lives in VMEM — HBM traffic per push drops by a factor of
    T versus the step-at-a-time XLA path (the reason the reference's Naive
    scheduler loses, SURVEY.md §3.3);
  * the cross-section table sits in VMEM as 128-wide chunks; per-step lookup
    is a chunk-swept ``tpu.dynamic_gather`` lane-LUT over only the chunk
    range the tile's energies actually occupy;
  * the shared-memory spawn buffer + lock protocol becomes a per-lane
    (depth, sublane, lane) child staging buffer written with depth-masked
    vector selects — no atomics, no fences, deterministic by construction;
  * CUDA's per-thread work stealing becomes a **work-list fixed point**: a
    ``lax.while_loop`` of kernel sweeps in which every lane is either
    unfinished (fresh, spawned-this-phase, or suspended) or finished.  A
    lane whose staging buffer fills SUSPENDS — its resume step and original
    spawn stamp are packed into the status word — and continues next sweep,
    so physics is exact for unbounded ionization chains (no child is ever
    dropped, unlike a fixed-depth buffer).  Fully-finished tiles skip with
    only a DMA passthrough.

Physics is bit-identical to the pure-JAX cadences: the kernel calls the very
same ``ops.physics.update_particles`` / ``rng.step_draws`` code on (S, 128)
tiles (tests/test_pallas.py asserts multiset equality, including tiny
spawn-depth configs that force suspension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import rng
from ...config import SimConfig
from ...constants import STATUS_DEAD, STATUS_EMPTY
from ...state import SimState
from ..physics import Particles, make_kick, update_particles
from .. import population

LANES = 128
DEFAULT_SUBLANES = 32   # tile = sublanes x 128 particles


def _tile_dims(config):
    sub = getattr(config, "kernel_sublanes", DEFAULT_SUBLANES) or DEFAULT_SUBLANES
    return sub, sub * LANES

FIELD_NAMES = (
    "px", "py", "pz", "vx", "vy", "vz", "ax", "ay", "az",
    "status", "id_hi", "id_lo",
)

_INF_START = 0x7FFFFFF  # python int: jnp constants may not be captured by kernels

# ---- phase-internal status encodings (never escape the mobility phase) ----
# unfinished: -1 | s>0 | suspended (<= _SUS_BASE, packs resume step + stamp)
# finished:   (_SUS_BASE, _FIN_BASE] packs the original stamp
_FIN_BASE = -10
_SUS_BASE = -40000
_STAMP_BITS = 15
_STAMP_MASK = (1 << _STAMP_BITS) - 1


def _encode_finished(stamp):
    return _FIN_BASE - (stamp + 2)


def _is_finished(s):
    return (s <= _FIN_BASE) & (s > _SUS_BASE)


def _decode_finished(s):
    return _FIN_BASE - s - 2


def _encode_suspended(resume, stamp):
    return _SUS_BASE - (
        ((resume - 1) << _STAMP_BITS) | (stamp + 2)
    )


def _is_suspended(s):
    return s <= _SUS_BASE


def _suspended_resume(s):
    return ((_SUS_BASE - s) >> _STAMP_BITS) + 1


def _suspended_stamp(s):
    return ((_SUS_BASE - s) & _STAMP_MASK) - 2


def _is_unfinished(s):
    return (s == -1) | (s > 0) | _is_suspended(s)


def _field_dtype(name):
    if name == "status":
        return jnp.int32
    if name in ("id_hi", "id_lo"):
        return jnp.uint32
    return jnp.float32


def _wave_loop(start, stop, visit, acc, waves):
    """fori_loop over [start, stop) visits, unrolled ``waves`` per trip.

    A dynamic per-chunk trip costs ~2x a static visit because the
    loop-carried (S, L) accumulators round-trip VMEM every iteration;
    unrolling W visits per trip amortizes the carry round-trip W-fold at
    the price of <= W-1 padding visits past ``stop``.  The caller's
    ``visit(c, acc)`` must be a no-op for c >= stop (the select masks the
    sweeps use — ``hi == c`` over lanes that cannot exceed the sweep's own
    max — already guarantee it) and must clamp any table-row read.
    ``waves=0`` keeps the plain per-chunk loop."""
    if waves <= 1:
        return jax.lax.fori_loop(start, stop, visit, acc)
    n_waves = jnp.maximum(-((start - stop) // waves), 0)

    def wave(w, a):
        base = start + w * waves
        for d in range(waves):
            a = visit(base + d, a)
        return a

    return jax.lax.fori_loop(0, n_waves, wave, acc)


def make_chunked_lookup(n_chunks, mode="band0", static_chunks=8, hits=False,
                        tail_waves=0, poly_degree=4, cand_gate=False,
                        poly_pack=False, margin_fold=False):
    """(energy, u, bits) -> (split, remove) via chunk-swept lane-LUT.

    The (10000, 2) table is laid out as two (n_chunks, 128) arrays; bucket
    idx decomposes into (chunk, offset); each chunk lookup is one
    ``tpu.dynamic_gather`` (take_along_axis on the lane axis) over the
    chunk's values broadcast to the tile shape.  Only chunks in the band
    the tile's energies actually occupy are visited.

    Modes:
      * ``minmax``   — sweep [min(hi), max(hi)];
      * ``band0``    — chunk 0 (the E=0 attractor) handled unconditionally,
                       sweep only the band of nonzero chunks;
      * ``needband`` — band0, plus the nonzero band is restricted to lanes
                       that can actually collide: ``aux_ref`` holds the
                       per-chunk max of (split + remove), gathered per-lane
                       with one extra take_along_axis; a lane with
                       ``u >= bound[hi]`` gets (0, 0), which is exact
                       (physics.update_particles compares u < split and
                       u < split+remove only).  Measured: collisions are
                       rare (3.9% at the bench point) but needy lanes still
                       span the whole band, so the win is small;
      * ``threshold`` — the fast path.  Both physics comparisons are integer
                       compares of the draw's own top bits against
                       per-bucket thresholds: ``u < c`` iff ``P < T(c)``
                       where P = bits >> 8 is the 24-bit payload that
                       produced u (rng.uniform_from_bits) and T(c) counts
                       the payloads mapping below c — so 16-bit truncations
                       of T decide every lane whose P8 = bits >> 16 differs
                       from T >> 8.  ``aux_ref`` packs both truncated
                       thresholds in ONE i32 table (split high, split+remove
                       low): the band sweep does a single i32 gather per
                       chunk instead of two f32 gathers, and the rare
                       undecided lanes (P8 == T >> 8, ~2^-15 per lane-step)
                       fall back to an exact f32 sweep over just their
                       chunks.  Bit-exact by construction;
      * ``pipeband``  — the engine's hot path: identical values to band0,
                       but the nonzero-chunk band bounds are SUPPLIED by the
                       caller via ``band=(hmin, hmax)`` (carried scalars
                       computed from the previous mobility step's
                       end-of-step velocities run through the exact
                       integrator) instead of reduced from this step's
                       energies.  Measured: the per-step vector->scalar
                       reductions + dynamic loop-bound setup stalls cost
                       ~4.7 us per tile-step — 3x the band sweep itself.
                       Exactness: the band must cover every ACTIVE lane's
                       nonzero chunk (inactive lanes' lookups are gated off
                       in physics.update_particles), which the caller
                       guarantees by bounding over ALL lanes;
      * ``statichybrid`` — chunks [0, static_chunks] swept with a STATIC
                       unroll (measured: a dynamic-trip fori_loop visit
                       costs ~2x a static one — the loop-carried (S, L)
                       accumulators round-trip VMEM every iteration), plus
                       a dynamic tail loop for the rare lanes beyond
                       (zero-trip when none).  Exact for any energies;
      * ``staticthresh`` — statichybrid over the packed threshold table
                       (one i32 gather per visit, integer decide, exact
                       rare-lane fallback as in ``threshold``);
      * ``staticthresh_m`` — staticthresh with the over-tail MERGED into
                       the tie fallback: band escapees (hi > K) join the
                       undecided lanes' exact f32 sweep, so each step pays
                       one reduction pair + one dynamic loop setup instead
                       of two.  Exact for any energies (escapees take the
                       f32 oracle values);
      * ``staticguard`` — staticthresh with every static visit c >= 1
                       additionally gated on the tile's PER-STEP chunk band
                       [hmin, hmax] (two vector->scalar reductions, measured
                       cheap): a ``lax.cond`` skips the visit's gather+select
                       entirely when no lane occupies chunk c this step.
                       The probe data shows the live band spans ~5 of the 9
                       statically unrolled chunks at the bench point, so
                       ~4 visits' VMEM traffic vanishes.  Values are
                       identical to staticthresh by construction (skipped
                       visits could only have written lanes that don't
                       exist).

    ``hits=True`` (threshold-family modes only) switches the RETURN PROTOCOL:
    instead of (split, remove) f32 pseudo-chances the lookup returns the two
    decided booleans ``(u < split, u < split + remove)`` directly and sets
    ``lookup.returns_hits = True`` so physics.update_particles skips its own
    f32 compares.  Outcomes are bit-identical: decided lanes use the exact
    integer thresholds (u < c iff P < T(c)); undecided lanes use the same
    exact f32 compares physics would have done.  Saves ~4 vector ops per
    mobility step in the spill-bound T-loop (the pseudo-chance selects in
    the lookup tail plus the compare+add in physics).
    """
    from ...cross_section import energy_to_index

    def prepare_static(aux_ref, shape):
        """Hoistable prep for the static* threshold modes: the static-unroll
        chunk rows broadcast to the tile shape.  The rows are loop-INVARIANT
        across the mobility T-loop, but when the broadcast lives inside the
        lookup each visit re-materializes it — S/8 vreg writes per visit per
        step (~1/3 of the visit's op count at S=128).  Callers build this
        ONCE before the T-loop and pass it via ``lookup(..., prep=...)``."""
        if mode.startswith("polythresh"):
            # rows 0..degree: f32 coefficients; degree+1: packed per-chunk
            # 16-bit margins (i32); degree+2: chunk 0's exact f32 threshold
            # row.  Storage is i32 bit-patterns (gathers must never
            # canonicalize a NaN payload); the f32 rows bitcast back here,
            # once.  With poly_pack (degree 2) the layout shrinks: row 0 =
            # both high-power coefficients as 16-bit halves (kept i32 —
            # unpacked per gather), row 1 = a0 (f32), row 2 = margins,
            # row 3 = chunk-0 exact row, row 4 = candidate bound.  With
            # margin_fold on top: row 1 = (a0q << 8) | margin_exp (i32),
            # row 2 = chunk-0 exact row, row 3 = candidate bound.
            if margin_fold:
                n_coef_rows, f32_rows = 2, {2}
                n_aux = 1  # e0 only; margins live inside row 1
            else:
                n_coef_rows = 2 if poly_pack else poly_degree + 1
                f32_rows = (
                    {1, 3} if poly_pack
                    else set(range(poly_degree + 1)) | {poly_degree + 2}
                )
                n_aux = 2  # margin row + e0 row
            rows = []
            for r in range(n_coef_rows + n_aux):
                p = jnp.broadcast_to(aux_ref[r, :][None, :], shape)
                if r in f32_rows:
                    p = jax.lax.bitcast_convert_type(p, jnp.float32)
                rows.append(p)
            if cand_gate:
                # the candidate bound (last row, every lane equal) is
                # hoisted as a (1, L) i32 row — the per-step integer
                # compare broadcasts it across sublanes (a scalar load +
                # bitcast would be cheaper still, but Mosaic rejects
                # scalar tpu.bitcast and scalar VMEM reads are unproven)
                rows.append(aux_ref[n_coef_rows + n_aux, :][None, :])
            return tuple(rows)
        K = min(static_chunks, n_chunks - 1)
        if mode in ("staticfull", "staticfull2"):
            # both threshold blocks of the stacked full table: prep holds
            # 2*(K+1) rows — T(split) rows first, then T(split+remove)
            stride = pl.cdiv(n_chunks, 8) * 8
            return tuple(
                jnp.broadcast_to(aux_ref[base + c, :][None, :], shape)
                for base in (0, stride)
                for c in range(K + 1)
            )
        return tuple(
            jnp.broadcast_to(aux_ref[c, :][None, :], shape)
            for c in range(K + 1)
        )

    def lookup(split_ref, remove_ref, aux_ref, energy, u, bits, band=None,
               prep=None):
        shape = energy.shape
        if mode == "probeconst":
            # TIMING PROBE ONLY (wrong physics): constant chances with
            # bench-like churn, zero table traffic — measures the true
            # cost of the chunk-swept lookup inside the real engine
            # (upper bound for any visit-count-reduction scheme, e.g. an
            # event-skipping draw protocol).
            return (
                jnp.full(shape, 0.002, jnp.float32),
                jnp.full(shape, 0.002, jnp.float32),
            )
        if mode == "probeidx":
            # TIMING PROBE ONLY (wrong physics): probeconst plus a LIVE
            # energy_to_index — the delta vs probeconst prices the per-step
            # log10/trunc/clip bucketing chain alone, bounding the win of
            # any bitcast-exponent indexing scheme before building its
            # exactness machinery.  The parity bit keeps the index alive
            # through DCE without being statically foldable.
            idxp = energy_to_index(energy)
            sp = jnp.float32(0.002) + (idxp & 1).astype(jnp.float32) * (
                jnp.float32(1e-7)
            )
            return sp, jnp.full(shape, 0.002, jnp.float32)
        if mode == "polythresh_bitfloor":
            # TIMING PROBE ONLY (wrong physics): the full bitcast-indexed
            # poly path at the polyfloor protocol — chunk = clamped f32
            # EXPONENT of the energy (no log10, no trunc/clip, no lo), the
            # mantissa is the Horner abscissa.  Gathers read the polythresh
            # aux rows (wrong values, right op count).  bitfloor minus
            # polyfloor = (bucketing chain) minus (bitcast chain): the true
            # ceiling of an exact bitpoly redesign.
            d = poly_degree
            x = jax.lax.bitcast_convert_type(energy, jnp.int32)
            g = jnp.clip((x >> 23) - 106, 0, 127)
            t = (x & 0x7FFFFF).astype(jnp.float32) * jnp.float32(
                2.0**-22
            ) - jnp.float32(1.0)

            def rowb(r, as_f32):
                if prep is not None:
                    return prep[r]
                p = jnp.broadcast_to(aux_ref[r, :][None, :], shape)
                return (
                    jax.lax.bitcast_convert_type(p, jnp.float32)
                    if as_f32
                    else p
                )

            val = jnp.take_along_axis(rowb(0, True), g, axis=1)
            for k in range(1, d + 1):
                val = val * t + jnp.take_along_axis(rowb(k, True), g, axis=1)
            mg = jnp.take_along_axis(rowb(d + 1, False), g, axis=1)
            dls = ((mg >> 16) & 0xFFFF).astype(jnp.float32)
            dlt = (mg & 0xFFFF).astype(jnp.float32)
            p24f = jax.lax.bitcast_convert_type(
                jnp.asarray(bits, jnp.uint32) >> jnp.uint32(8), jnp.int32
            ).astype(jnp.float32)
            v2 = val + val
            s_hit = p24f < val - dls
            t_hit = p24f < v2 - dlt
            big = jnp.float32(101.0)
            sp = jnp.where(s_hit, big, 0.0)
            rm = jnp.where(t_hit & jnp.logical_not(s_hit), big, 0.0)
            return sp, rm
        idx = energy_to_index(energy)
        hi = idx // LANES
        lo = idx % LANES

        if mode in ("staticfull", "staticfull2"):
            # EXACT full-payload threshold compare (pack_threshold_full):
            # two i32 gathers per static visit, no tie fallback and no
            # per-step undecided reductions.  Only the over-tail (hi > K,
            # rare band escapees) keeps a dynamic sweep — staticfull2
            # additionally gates that whole tail (its two bound reductions
            # + loop setup) behind ONE max-reduction cond, so the common
            # all-lanes-in-band step pays a single reduce.
            K = min(static_chunks, n_chunks - 1)
            stride = pl.cdiv(n_chunks, 8) * 8

            def full_chunk(c, block):
                if prep is not None and isinstance(c, int) and c <= K:
                    row = prep[block * (K + 1) + c]
                else:
                    row = jnp.broadcast_to(
                        aux_ref[block * stride + c, :][None, :], shape
                    )
                return jnp.take_along_axis(row, lo, axis=1)

            ts = jnp.zeros(shape, jnp.int32)
            tt = jnp.zeros(shape, jnp.int32)
            for c in range(K + 1):          # static unroll incl. chunk 0
                sel = hi == c
                ts = jnp.where(sel, full_chunk(c, 0), ts)
                tt = jnp.where(sel, full_chunk(c, 1), tt)

            def full_body(c, acc):
                ts_, tt_ = acc
                sel = hi == c
                return (
                    jnp.where(sel, full_chunk(c, 0), ts_),
                    jnp.where(sel, full_chunk(c, 1), tt_),
                )

            def over_tail(acc):
                over = hi > K
                hmin_o = jnp.min(jnp.where(over, hi, n_chunks - 1))
                hmax_o = jnp.max(jnp.where(over, hi, 1))
                return jax.lax.fori_loop(
                    jnp.maximum(K + 1, hmin_o), hmax_o + 1, full_body, acc
                )

            if mode == "staticfull2":
                ts, tt = jax.lax.cond(
                    jnp.max(hi) > K, over_tail, lambda a: a, (ts, tt)
                )
            else:
                ts, tt = over_tail((ts, tt))
            p24 = jax.lax.bitcast_convert_type(
                jnp.asarray(bits, jnp.uint32) >> jnp.uint32(8), jnp.int32
            )
            s_hit = p24 < ts
            t_hit = p24 < tt
            if hits:
                return s_hit, t_hit
            big = jnp.float32(101.0)
            sp = jnp.where(s_hit, big, 0.0)
            rm = jnp.where(t_hit & jnp.logical_not(s_hit), big, 0.0)
            return sp, rm

        def chunk_vals(c):
            ci = c if isinstance(c, int) else jnp.minimum(c, n_chunks - 1)
            sp_chunk = jnp.broadcast_to(split_ref[ci, :][None, :], shape)
            rm_chunk = jnp.broadcast_to(remove_ref[ci, :][None, :], shape)
            return (
                jnp.take_along_axis(sp_chunk, lo, axis=1),
                jnp.take_along_axis(rm_chunk, lo, axis=1),
            )

        def body(c, acc):
            s, r = acc
            sel = hi == c
            spc, rmc = chunk_vals(c)
            return jnp.where(sel, spc, s), jnp.where(sel, rmc, r)

        def resolve(s_hit, t_hit, und):
            # ---- exact fallback: f32 sweep over the undecided lanes only,
            # then merge with the integer-decided lanes (shared by every
            # threshold-family mode) ----
            zeros = jnp.zeros(shape, jnp.float32)
            hmin_u = jnp.min(jnp.where(und, hi, n_chunks - 1))
            hmax_u = jnp.max(jnp.where(und, hi, 0))
            sp_e, rm_e = _wave_loop(
                hmin_u, hmax_u + 1, body, (zeros, zeros), tail_waves
            )
            if hits:
                # boolean protocol: merge the rare undecided lanes' exact
                # f32 outcomes straight into the integer decisions.  Logical
                # ops, NOT jnp.where: a vector select on i1 operands lowers
                # through an i8 select + trunci-to-i1 that Mosaic rejects
                # ("Unsupported target bitwidth for truncation").
                uf = u.astype(jnp.float32)
                nund = jnp.logical_not(und)
                s_fin = (und & (uf < sp_e)) | (nund & s_hit)
                t_fin = (und & (uf < sp_e + rm_e)) | (nund & t_hit)
                return s_fin, t_fin
            # certain lanes: effective chances force the exact outcome
            # (u is in [0, 100), so 101 always compares true, 0 false;
            # s_hit implies t_hit because split <= split + remove)
            big = jnp.float32(101.0)
            sp = jnp.where(und, sp_e, jnp.where(s_hit, big, 0.0))
            rm = jnp.where(
                und, rm_e, jnp.where(t_hit & jnp.logical_not(s_hit), big, 0.0)
            )
            return sp, rm

        if mode.startswith("polythresh"):
            # Per-chunk polynomial fit of the exact 24-bit split threshold
            # (pack_poly_thresholds): degree+1 single-row lane-LUTs on the
            # CHUNK index + a Horner evaluation decide both comparisons for
            # every lane of every fitted chunk — no per-visit selects, no
            # over-tail machinery.  Chunk 0 (the E=0 attractor; unfittable
            # i^0.1 kink) substitutes its exact f32 threshold row into the
            # same value/margin protocol (one gather + one select).
            # Unfitted chunks' coefficients are NaN: Horner propagates it,
            # both margin compares come out False, and those lanes join
            # the tie lanes in the exact f32 fallback.
            d = poly_degree

            def row(r, as_f32):
                if prep is not None:
                    return prep[r]
                p = jnp.broadcast_to(aux_ref[r, :][None, :], shape)
                return (
                    jax.lax.bitcast_convert_type(p, jnp.float32)
                    if as_f32
                    else p
                )

            xs = (lo.astype(jnp.float32) - 63.5) * jnp.float32(1.0 / 63.5)
            if poly_pack:
                # ONE gather fetches both high-power coefficients as
                # 16-bit halves; widening a bf16 half = its f32 bits with
                # a zero low half, so mask/shift + bitcast reconstruct
                # exactly the values the margins were measured against
                # (pack_poly_thresholds pack_bf16).  NaN chunks widen
                # back to NaN and poison the Horner value as before.
                pk = jnp.take_along_axis(row(0, False), hi, axis=1)
                c2 = jax.lax.bitcast_convert_type(
                    pk & jnp.int32(-65536), jnp.float32
                )
                c1 = jax.lax.bitcast_convert_type(pk << 16, jnp.float32)
                if margin_fold:
                    # round-5 gather rung: ONE i32 row carries a0 (23-bit
                    # quantized: q*4 - 2^21 is exact integer f32
                    # arithmetic) AND the shared margin as an f32 exponent
                    # byte — 3 aux gathers per step instead of 4.  The
                    # margins were measured against this exact
                    # reconstruction at pack time (fold_margin docstring).
                    am = jnp.take_along_axis(row(1, False), hi, axis=1)
                    a0 = (am >> 8).astype(jnp.float32) * 4.0 - 2097152.0
                    val = (c2 * xs + c1) * xs + a0
                    dshared = jax.lax.bitcast_convert_type(
                        (am & 0xFF) << 23, jnp.float32
                    )
                    mg_row, e0_row = None, 2
                else:
                    val = (c2 * xs + c1) * xs + jnp.take_along_axis(
                        row(1, True), hi, axis=1
                    )
                    mg_row, e0_row = 2, 3
            else:
                val = jnp.take_along_axis(row(0, True), hi, axis=1)
                for k in range(1, d + 1):
                    val = val * xs + jnp.take_along_axis(
                        row(k, True), hi, axis=1
                    )
                mg_row, e0_row = d + 1, d + 2
            # chunk 0 folds into the same value/margin protocol via one
            # exact-row gather + one select (its margins are ~pad-sized)
            e0 = jnp.take_along_axis(row(e0_row, True), lo, axis=1)
            val = jnp.where(hi == 0, e0, val)
            if mg_row is None:
                dls = dlt = dshared
            else:
                # per-chunk packed margins: one gather, two 16-bit unpacks
                mg = jnp.take_along_axis(row(mg_row, False), hi, axis=1)
                dls = ((mg >> 16) & 0xFFFF).astype(jnp.float32)
                dlt = (mg & 0xFFFF).astype(jnp.float32)
            p24f = jax.lax.bitcast_convert_type(
                jnp.asarray(bits, jnp.uint32) >> jnp.uint32(8), jnp.int32
            ).astype(jnp.float32)
            v2 = val + val
            s_hit = p24f < val - dls
            s_dec = s_hit | (p24f >= val + dls)
            t_hit = p24f < v2 - dlt
            t_dec = t_hit | (p24f >= v2 + dlt)
            if mode == "polythresh_floor":
                # TIMING PROBE (wrong physics on margin/escapee lanes):
                # decide every lane by the raw compares — no undecided
                # reductions, no fallback sweep.  Prices the poly path's
                # fixed per-step cost against st_floor2's static-sweep
                # floor to attribute the r3i deficit.
                big = jnp.float32(101.0)
                sp = jnp.where(s_hit, big, 0.0)
                rm = jnp.where(t_hit & jnp.logical_not(s_hit), big, 0.0)
                return sp, rm
            und = jnp.logical_not(s_dec & t_dec)
            if cand_gate:
                # Candidate gate (EXACT): a lane with p24 >= max_idx
                # T(split+remove) can never collide, and its raw compares
                # already decide that (val - delta_s <= T_s <= p24max by
                # margin soundness; NaN chunks compare False) — so tie and
                # escapee lanes only join the fallback sweep on the ~p_max
                # fraction of steps where their draw is a live candidate.
                # One compare + one and per step buys a ~1/p_max cut in
                # fallback trips (the late-window dominator).
                if margin_fold:
                    gate_row = 3
                elif poly_pack:
                    gate_row = 4
                else:
                    gate_row = d + 3
                if prep is not None:
                    pmax = prep[gate_row]
                else:
                    pmax = aux_ref[gate_row, :][None, :]
                p24i = jax.lax.bitcast_convert_type(
                    jnp.asarray(bits, jnp.uint32) >> jnp.uint32(8), jnp.int32
                )
                und = und & (p24i < pmax)
            return resolve(s_hit, t_hit, und)

        if mode == "minmax":
            zeros = jnp.zeros(shape, jnp.float32)
            return jax.lax.fori_loop(
                jnp.min(hi), jnp.max(hi) + 1, body, (zeros, zeros)
            )

        K = min(static_chunks, n_chunks - 1)

        if mode == "statichybrid":
            sp = jnp.zeros(shape, jnp.float32)
            rm = jnp.zeros(shape, jnp.float32)
            for c in range(K + 1):          # static unroll incl. chunk 0
                sel = hi == c
                spc, rmc = chunk_vals(c)
                sp = jnp.where(sel, spc, sp)
                rm = jnp.where(sel, rmc, rm)
            over = hi > K
            # tight tail band: long-T runs accelerate lanes into chunks far
            # above K — sweep [min, max] of the out-of-range lanes only
            hmin_o = jnp.min(jnp.where(over, hi, n_chunks - 1))
            hmax_o = jnp.max(jnp.where(over, hi, 1))
            return jax.lax.fori_loop(
                jnp.maximum(K + 1, hmin_o), hmax_o + 1, body, (sp, rm)
            )

        if mode in ("threshold", "staticguard") or mode.startswith("staticthresh"):
            # staticthresh_m (EXACT): merge the over-tail into the tie
            # fallback — band escapees (hi > K) skip the truncated protocol
            # and join the undecided lanes' exact f32 sweep.  One reduction
            # pair + one dynamic loop setup per step instead of two (the
            # r3f probes attribute ~9% of the step to the tie machinery and
            # ~5% to the over-tail; their scalar setup dominates, and the
            # merged sweep shares it).  Escapee outcomes come from the f32
            # oracle path, so values are exact for any energies.
            #
            # _noover/_noties/_floor2 are TIMING PROBES (wrong physics on a
            # ~2^-16 / rare-lane subset; never production modes):
            # staticthresh with the dynamic tail loops and their per-step
            # bound reductions surgically removed, to attribute the
            # lookup's measured cost (probeconst showed the full lookup is
            # ~55% of the step) between the 9 static gathers and the tail
            # machinery.
            merged = mode == "staticthresh_m"
            noover = merged or mode in (
                "staticthresh_noover", "staticthresh_floor2"
            )
            noties = mode in ("staticthresh_noties", "staticthresh_floor2")
            # ---- coarse pass: ONE i32 gather per chunk (band0 structure) ----
            def th_chunk(c):
                # static-unroll visits (python-int c) read the pre-broadcast
                # rows when the caller hoisted them; traced c (the dynamic
                # tail) always re-broadcasts.
                if prep is not None and isinstance(c, int) and c < len(prep):
                    row = prep[c]
                else:
                    # traced c may be a wave padding visit past the table
                    ci = c if isinstance(c, int) else jnp.minimum(
                        c, n_chunks - 1
                    )
                    row = jnp.broadcast_to(aux_ref[ci, :][None, :], shape)
                return jnp.take_along_axis(row, lo, axis=1)

            def th_body(c, acc):
                return jnp.where(hi == c, th_chunk(c), acc)

            if mode == "staticguard":
                # chunk 0 (E=0 attractor + gated-inactive lanes) always
                # visited; visits 1..K each skip (gather + select) via a
                # scalar-guarded cond when no lane occupies the chunk this
                # step.  Reductions over the per-step band are measured
                # cheap; the skipped VMEM traffic is not.
                nzm = hi > 0
                hmin_g = jnp.min(jnp.where(nzm, hi, n_chunks - 1))
                hmax_g = jnp.max(jnp.where(nzm, hi, 0))
                th = jnp.where(hi == 0, th_chunk(0), jnp.zeros(shape, jnp.int32))
                for c in range(1, K + 1):
                    th = jax.lax.cond(
                        (hmin_g <= c) & (c <= hmax_g),
                        lambda th_, c=c: jnp.where(hi == c, th_chunk(c), th_),
                        lambda th_: th_,
                        th,
                    )
                over = hi > K
                hmin_o = jnp.min(jnp.where(over, hi, n_chunks - 1))
                hmax_o = jnp.max(jnp.where(over, hi, 1))
                th = jax.lax.fori_loop(
                    jnp.maximum(K + 1, hmin_o), hmax_o + 1, th_body, th
                )
            elif mode.startswith("staticthresh"):
                th = jnp.zeros(shape, jnp.int32)
                for c in range(K + 1):      # static unroll incl. chunk 0
                    th = jnp.where(hi == c, th_chunk(c), th)
                if not noover:
                    over = hi > K
                    hmin_o = jnp.min(jnp.where(over, hi, n_chunks - 1))
                    hmax_o = jnp.max(jnp.where(over, hi, 1))
                    th = _wave_loop(
                        jnp.maximum(K + 1, hmin_o), hmax_o + 1, th_body, th,
                        tail_waves,
                    )
            else:
                sel0 = hi == 0
                th = jnp.where(sel0, th_chunk(0), 0)
                hmin_nz = jnp.min(jnp.where(sel0, n_chunks - 1, hi))
                hmax_nz = jnp.max(jnp.where(sel0, 1, hi))
                th = jax.lax.fori_loop(hmin_nz, hmax_nz + 1, th_body, th)

            p8 = jax.lax.bitcast_convert_type(
                jnp.asarray(bits, jnp.uint32) >> jnp.uint32(16), jnp.int32
            )
            ts8 = (th >> 16) & 0xFFFF
            tt8 = th & 0xFFFF
            s_hit = p8 < ts8
            t_hit = p8 < tt8
            if noties:
                # probe: resolve the ~2^-16/lane ties by the truncated
                # compare alone — no undecided reductions, no f32 sweep
                big = jnp.float32(101.0)
                sp = jnp.where(s_hit, big, 0.0)
                rm = jnp.where(t_hit & jnp.logical_not(s_hit), big, 0.0)
                return sp, rm
            und = (p8 == ts8) | (p8 == tt8)
            if merged:
                und = und | (hi > K)
            return resolve(s_hit, t_hit, und)

        # chunk 0 (the lowest-energy band) is a persistent attractor —
        # particles in zero-field cells sit at E=0 forever — handle it
        # unconditionally and sweep only the band of *nonzero* chunks.
        sel0 = hi == 0
        sp0, rm0 = chunk_vals(0)
        sp = jnp.where(sel0, sp0, 0.0)
        rm = jnp.where(sel0, rm0, 0.0)
        if mode == "pipeband":
            return jax.lax.fori_loop(band[0], band[1] + 1, body, (sp, rm))
        if mode == "needband":
            bound = jnp.take_along_axis(
                jnp.broadcast_to(aux_ref[0, :][None, :], shape), hi, axis=1
            )
            mask_nz = (u < bound) & jnp.logical_not(sel0)
        else:
            mask_nz = jnp.logical_not(sel0)
        hmin_nz = jnp.min(jnp.where(mask_nz, hi, n_chunks - 1))
        hmax_nz = jnp.max(jnp.where(mask_nz, hi, 1))
        return jax.lax.fori_loop(hmin_nz, hmax_nz + 1, body, (sp, rm))

    if hits and mode not in ("threshold", "staticthresh", "staticthresh_m",
                             "staticguard", "staticfull", "staticfull2",
                             "polythresh"):
        raise ValueError(f"hits protocol requires a threshold-family mode, got {mode!r}")
    lookup.prepare_static = prepare_static
    lookup.returns_hits = hits
    return lookup


def _exact_threshold(c):
    """T(c) = #{P in [0, 2^24) : uniform_from_bits-value(P) < c} — the exact
    integer threshold with ``u < c  iff  P < T(c)`` for the kernel's draw
    u = f32(f32(P) * 2^-24) * 100 (rng.uniform_from_bits with lo=0, hi=100).

    Computed with pure jnp ops (the table is traced under jit): a first-order
    f32 estimate lands within +-4 of the boundary (|q*2^24 - c*2^24/100| <=
    c/100 + 1 <= 2 for c <= 100, and the final *100 rounding moves the
    boundary by at most 2 more indices), so counting u(P) < c over a +-6
    window around it is exact.
    """
    c = c.astype(jnp.float32)
    q = c / jnp.float32(100.0)
    t0 = jnp.floor(q * jnp.float32(1 << 24)).astype(jnp.int32)
    base = jnp.clip(t0 - 6, 0, 1 << 24)
    count = jnp.zeros_like(base)
    for d in range(13):
        p = base + d
        valid = p < (1 << 24)
        u = (
            jnp.clip(p, 0, (1 << 24) - 1).astype(jnp.float32)
            * jnp.float32(2.0**-24)
        ) * jnp.float32(100.0)
        count = count + (valid & (u < c)).astype(jnp.int32)
    return base + count


def pack_threshold_table(table):
    """(n, 2) chance table -> (n_chunks, 128) i32 of packed 16-bit coarse
    thresholds: bits[31:16] = min(T(split) >> 8, 0xFFFF), bits[15:0] =
    min(T(split + remove) >> 8, 0xFFFF).  A lane whose draw payload top-16
    differs from a stored value is decided exactly by the i32 compare; equal
    lanes (~2^-15 per lane-step) take the exact f32 fallback."""
    split = table[:, 0].astype(jnp.float32)
    tot = split + table[:, 1].astype(jnp.float32)
    ts8 = jnp.minimum(_exact_threshold(split) >> 8, 0xFFFF)
    tt8 = jnp.minimum(_exact_threshold(tot) >> 8, 0xFFFF)
    packed = jax.lax.bitcast_convert_type(
        (ts8.astype(jnp.uint32) << jnp.uint32(16)) | tt8.astype(jnp.uint32),
        jnp.int32,
    )
    n = packed.shape[0]
    # rows padded to a multiple of 8 so the grouped lookup can slice whole
    # (8, 128) vreg groups; pad rows are all-zero (p8 > 0 -> certain miss,
    # p8 == 0 -> exact fallback) and unreachable anyway (idx <= n - 1)
    n_chunks = pl.cdiv(pl.cdiv(n, LANES), 8) * 8
    pad = n_chunks * LANES - n
    return jnp.pad(packed, (0, pad)).reshape(n_chunks, LANES)


def pack_threshold_full(table):
    """(n, 2) chance table -> (2 * n_chunks8, 128) i32 stack of EXACT
    24-bit integer thresholds: rows [0, n_chunks8) hold T(split), rows
    [n_chunks8, 2*n_chunks8) hold T(split + remove) (see _exact_threshold;
    ``u < c iff P24 < T(c)``).  The ``staticfull`` lookup compares the
    draw's full 24-bit payload against both directly — two gathers per
    visit but ZERO tie machinery: no undecided reductions and no dynamic
    f32 fallback sweep in the per-step path.  Pad rows are 0 (certain
    miss) and unreachable anyway (idx <= n - 1)."""
    split = table[:, 0].astype(jnp.float32)
    tot = split + table[:, 1].astype(jnp.float32)
    ts = _exact_threshold(split)
    tt = _exact_threshold(tot)
    n = ts.shape[0]
    n_chunks8 = pl.cdiv(pl.cdiv(n, LANES), 8) * 8
    pad = n_chunks8 * LANES - n
    return jnp.concatenate(
        [
            jnp.pad(ts, (0, pad)).reshape(n_chunks8, LANES),
            jnp.pad(tt, (0, pad)).reshape(n_chunks8, LANES),
        ],
        axis=0,
    )


# polythresh fit-quality gates (see pack_poly_thresholds): a chunk joins the
# fitted prefix only while its measured max |exact - f32-Horner| stays under
# the cap; the pad dominates any cross-lowering re-evaluation drift (XLA vs
# Mosaic, fma-vs-not: a few ulps of ~1e6-magnitude values, < 1.0 total).
# Margins are PER-CHUNK: the r3i v1 A/B (global margin, pad 64) lost 33% to
# base because delta_s=348 made ~2 lanes per tile-step margin-undecided
# across the whole fitted window — the dynamic fallback then swept ~18
# chunks every step.  Low chunks fit to err <= 8, so per-chunk margins put
# their undecided rate BELOW the 16-bit tie rate.
_POLY_ERR_CAP = 1024.0
_POLY_PAD = 8.0


def pack_poly_thresholds(table, degree=4, pack_bf16=False, fold_margin=False,
                         err_cap=None, fit="lsq"):
    """(n, 2) chance table -> (8-padded degree+4, 128) i32 pack for the
    ``polythresh`` lookup: a per-chunk least-squares polynomial fit of the
    EXACT 24-bit split threshold T(split) (see _exact_threshold) replaces
    the chunk-swept table gathers with ``degree + 1`` single-row lane-LUTs
    plus a Horner evaluation.

    Row layout (all rows stored as i32; coefficient/margin rows are f32
    bit-patterns — integer storage so gathers can never canonicalize a NaN
    payload):

      * rows [0, degree]: per-chunk f32 coefficients, highest power first
        (Horner order), of the fit over the chunk's 128 buckets in the
        scaled variable t = (offset - 63.5) / 63.5; lane c = chunk c.
        Chunks outside the fitted prefix (and chunk 0) carry NaN in every
        coefficient: Horner then yields NaN, both margin compares come out
        False, and all their lanes take the exact fallback — so no
        explicit window bound is ever tested;
      * row degree+1: PER-CHUNK margins, packed DELTA_S << 16 | DELTA_T as
        two 16-bit counts per lane.  DELTA_S = ceil(max |T_s - value| over
        the chunk's buckets) + _POLY_PAD; DELTA_T the same for the total
        compare, measured against the kernel's own 2*value expression (for
        the bundled sine table T(split+remove) = 2*T(split) + {-1, 0}
        exactly, so the doubling costs ~1 count; a generic table with
        unrelated columns just measures huge margins and degrades to the
        fallback — exact, merely slower).  Per-chunk (not global) margins
        matter: the low-energy chunks where the population lives fit to
        err <= 8, so their undecided rate stays below the 16-bit tie rate
        instead of inheriting the worst fitted chunk's margin (the r3i v1
        lesson);
      * row degree+2: chunk 0's EXACT 24-bit split thresholds as f32
        values (every T <= 2^24 is exactly representable) — the i^0.1
        kink at bucket 0 makes chunk 0 unfittable (measured: max err
        1.7e5 vs <= 300 for chunks 1..21 at degree 4), and chunk 0 is the
        E=0 attractor where most lanes sit.  The kernel folds this row
        into the Horner value with ONE select (``where(hi == 0, ...)``),
        so chunk 0 flows through the same margin compares as everything
        else: delta_s = pad (the gathered value is exact), delta_t =
        max |T_t - 2 T_s| + 2 pad (= 1 + 2 pad for the sine table) — no
        separate coarse-protocol block (the r3i v2 lesson: the extra
        p8/merge logic cost more than it saved in the spill-bound loop);
      * row degree+3: the global max total threshold (raw i32 count,
        replicated across lanes) — the ``lookup_cand_gate`` bound (a lane
        whose 24-bit draw payload is >= it can never collide, so it never
        needs the fallback sweep).

    Everything is traced jnp (the table is a jit argument); XLA hoists the
    pack out of the Poisson scan as loop-invariant.  The margins are
    MEASURED, not modeled, so decided lanes are provably exact for ANY
    table; fit quality only moves the undecided (fallback) rate.  The fit
    solve uses a STATIC f64 pseudoinverse of the shared Vandermonde basis
    (numpy, trace-time constant) — the only f32 step is one (chunks, 128)
    x (128, degree+1) matmul.

    ``pack_bf16`` (degree == 2 only, ``lookup_poly_pack``): the two
    higher-power coefficients are rounded to bf16 and packed as 16-bit
    halves of ONE i32 row — the kernel then pays 4 gathers per step
    instead of 5 (the r4 probe ladder prices the poly path's gathers at
    ~37% of the loop).  Exactness is untouched BY CONSTRUCTION: margins
    are measured against the same bf16-rounded Horner evaluation the
    kernel reconstructs (top-16 f32 bits == the widened bf16 value), so
    rounding only moves the measured margins (sine table: delta_s 368 ->
    378, delta_t 567 -> 922 — still far under the 16-bit field).  Packed
    row layout: row 0 = (bf16(a2) << 16) | bf16(a1); row 1 = a0 (f32);
    row 2 = margins; row 3 = chunk-0 exact row; row 4 = candidate bound.
    NaN-poisoned chunks survive packing (bf16(NaN) widens back to NaN).

    ``fold_margin`` (requires ``pack_bf16``, ``lookup_margin_fold``): the
    round-5 gather rung — 3 gathers per step instead of 4.  The margin row
    disappears: a0 is quantized to 23 bits (units of 4, bias 2^21 — the
    kernel's reconstruction q*4 - 2^21 is EXACT integer f32 arithmetic) and
    its freed low byte stores a single shared margin as an f32 exponent
    byte (delta = 2^(e-127), built in-kernel by one shift+bitcast — no
    gather).  Exactness is again by construction: margins are measured
    against the quantized evaluation the kernel reconstructs, the shared
    delta is max(delta_s, delta_t) rounded UP to a power of two, and wider
    margins only move lanes into the exact fallback.  Packed row layout:
    row 0 = bf16 pair; row 1 = (a0q << 8) | margin_exp; row 2 = chunk-0
    exact row; row 3 = candidate bound.
    """
    import numpy as np

    split = table[:, 0].astype(jnp.float32)
    tot = split + table[:, 1].astype(jnp.float32)
    ts = _exact_threshold(split)
    tt = _exact_threshold(tot)
    n = ts.shape[0]
    n_chunks = pl.cdiv(n, LANES)
    pad = n_chunks * LANES - n
    # edge-pad so a partial last chunk's fit isn't poisoned by synthetic
    # zeros (it is judged on real + replicated-edge values; exactness never
    # depends on the fit, only on the measured margin)
    ts_p = jnp.pad(ts, (0, pad), mode="edge").reshape(n_chunks, LANES)
    tt_p = jnp.pad(tt, (0, pad), mode="edge").reshape(n_chunks, LANES)
    y = ts_p.astype(jnp.float32)

    xs_np = (np.arange(LANES, dtype=np.float64) - 63.5) / 63.5
    basis = np.stack([xs_np**k for k in range(degree + 1)], axis=1)
    pinv = np.linalg.pinv(basis)  # (degree+1, LANES), static f64 constant
    coef = y @ jnp.asarray(pinv.T, jnp.float32)      # (C, degree+1) low->high
    if fit == "minimax":
        # Lawson's iteratively-reweighted LSQ converges to the L-infinity
        # (minimax) fit: the margin IS the max error, so minimizing the max
        # rather than the L2 norm shrinks every measured margin (~2x for
        # smooth chunks) and lets the fitted window extend further before
        # hitting the 16-bit ceiling — at ZERO kernel cost (fit quality
        # only moves the undecided rate; margins stay measured, so
        # exactness is untouched).  Batched per chunk; normal equations in
        # f32 are well-conditioned on the [-1,1]-scaled basis.
        B = jnp.asarray(basis, jnp.float32)          # (L, d+1)
        w = jnp.ones_like(y)

        def solve3(G, rhs):
            # closed-form batched 3x3 solve (Cramer / adjugate): pure
            # elementwise ops — unlike jnp.linalg.solve's LU custom call,
            # this is hoistable loop-invariant code (the r5d A/B measured
            # the custom-call version costing 38% of the STEP because it
            # re-executed inside the jitted scan)
            a, b, c = G[:, 0, 0], G[:, 0, 1], G[:, 0, 2]
            d, e, f = G[:, 1, 0], G[:, 1, 1], G[:, 1, 2]
            g, h, i = G[:, 2, 0], G[:, 2, 1], G[:, 2, 2]
            A = e * i - f * h
            Bm = -(d * i - f * g)
            Cm = d * h - e * g
            det = a * A + b * Bm + c * Cm
            inv_det = 1.0 / det
            x0 = rhs[:, 0] * A + rhs[:, 1] * (c * h - b * i) \
                + rhs[:, 2] * (b * f - c * e)
            x1 = rhs[:, 0] * Bm + rhs[:, 1] * (a * i - c * g) \
                + rhs[:, 2] * (c * d - a * f)
            x2 = rhs[:, 0] * Cm + rhs[:, 1] * (b * g - a * h) \
                + rhs[:, 2] * (a * e - b * d)
            return jnp.stack([x0, x1, x2], axis=1) * inv_det[:, None]

        # UNROLLED python-for, deliberately: a lax.fori_loop is a control
        # -flow op that XLA's loop-invariant code motion cannot hoist out
        # of the engine's Poisson scan, so the whole fit re-executed per
        # scan iteration (r5d/e A/Bs: -22% to -38% on the STEP).  Straight
        # -line ops hoist like the lsq matmul does.
        for _ in range(40):
            G = jnp.einsum("cl,lk,lj->ckj", w, B, B)
            rhs = jnp.einsum("cl,lk,cl->ck", w, B, y)
            G = G + 1e-6 * jnp.eye(B.shape[1])[None]
            if degree == 2:
                coef = solve3(G, rhs)
            else:
                coef = jnp.linalg.solve(G, rhs[..., None])[..., 0]
            r = jnp.abs(y - coef @ B.T) + 1e-3
            w = w * r
            w = w / jnp.sum(w, axis=1, keepdims=True)
    cf = coef[:, ::-1]                               # high->low (Horner)
    if fold_margin and not pack_bf16:
        raise ValueError("fold_margin requires pack_bf16 (degree 2)")
    if pack_bf16:
        if degree != 2:
            raise ValueError("pack_bf16 supports degree == 2 only")
        # round a2, a1 to bf16 BEFORE measuring: the margins then absorb
        # the rounding error and decided lanes stay provably exact
        cf = cf.at[:, 0:2].set(
            cf[:, 0:2].astype(jnp.bfloat16).astype(jnp.float32)
        )
    if fold_margin:
        # quantize a0 onto the 23-bit biased grid BEFORE measuring: the
        # kernel's reconstruction q*4 - 2^21 is exact integer f32
        # arithmetic, so measurement and kernel see the same value
        a0q = jnp.clip(
            jnp.round((cf[:, 2] + 2097152.0) * 0.25), 0.0, float((1 << 23) - 1)
        )
        cf = cf.at[:, 2].set(a0q * 4.0 - 2097152.0)

    # measure the fit with the SAME f32 expressions the kernel runs: the
    # Horner value for chunks >= 1, the exact f32 row for chunk 0
    xs = jnp.asarray(xs_np, jnp.float32)
    val = jnp.broadcast_to(cf[:, 0:1], (n_chunks, LANES))
    for k in range(1, degree + 1):
        val = val * xs[None, :] + cf[:, k : k + 1]
    exact0 = ts_p[0].astype(jnp.float32)             # every T <= 2^24: exact
    val = val.at[0].set(exact0)
    err_s = jnp.max(jnp.abs(val - ts_p.astype(jnp.float32)), axis=1)
    err_t = jnp.max(jnp.abs(val + val - tt_p.astype(jnp.float32)), axis=1)

    # fit-quality gate: a chunk joins the fitted window only while its
    # margins stay sound AND representable.  ``err_cap`` (config
    # lookup_poly_err_cap) trades window width against margin tightness:
    # the r5 window-extension insight is that a chunk with a FAT margin is
    # still far cheaper than an unfitted one (an escapee lane pays a
    # fallback trip on every candidate draw, ~9% of lane-steps for the
    # sine table; a fitted lane with delta=50000 only on the ~0.6% of
    # draws inside the margin).  The hard ceiling is the 16-bit margin
    # field: a clipped margin would be UNSOUND, so the gate enforces
    # representability whatever the cap says.
    cap = _POLY_ERR_CAP if err_cap is None else float(err_cap)
    cap_s = min(cap, float(0xFFFF) - _POLY_PAD)
    cap_t = min(2.0 * cap + 2.0, float(0xFFFF) - 2.0 * _POLY_PAD)
    ok = (err_s <= cap_s) & (err_t <= cap_t)
    ok = ok.at[0].set(False)  # chunk 0 never uses its (meaningless) fit
    # fitted chunks form the longest ok-prefix of 1..C-1 (the sine table's
    # phase velocity grows with energy, so errors are monotone-ish; a
    # prefix keeps the escapee band contiguous for the fallback sweep).
    # Chunk 0 is decided through the exact row whatever its margins say:
    # err_s[0] is 0 by construction and a pathological err_t[0] just makes
    # its t-compare undecided (exact, slower).
    fitted = (jnp.cumsum(jnp.logical_not(ok).astype(jnp.int32)) <= 1) & ok
    delta_s = jnp.ceil(err_s) + _POLY_PAD
    delta_t = jnp.ceil(err_t) + 2.0 * _POLY_PAD
    margins = (
        jnp.clip(delta_s, 0, 0xFFFF).astype(jnp.int32) << 16
    ) | jnp.clip(delta_t, 0, 0xFFFF).astype(jnp.int32)

    nanv = jnp.float32(jnp.nan)
    cf = jnp.where(fitted[:, None], cf, nanv)
    rows_f32 = [
        jnp.pad(cf[:, k], (0, LANES - n_chunks), constant_values=jnp.nan)
        for k in range(degree + 1)
    ]
    if pack_bf16:
        # one i32 row: top 16 f32 bits of a2 (== its bf16 bits, since the
        # values were bf16-rounded above) in the high half, a1's in the
        # low half; the f32 constant row a0 follows.  NaN rows pack to
        # 0x7FC0 halves, which widen back to NaN in the kernel.
        def top16(r):
            return (
                jax.lax.bitcast_convert_type(
                    r.astype(jnp.float32), jnp.int32
                )
                >> 16
            ) & jnp.int32(0xFFFF)

        rows = [
            (top16(rows_f32[0]) << 16) | top16(rows_f32[1]),
            jax.lax.bitcast_convert_type(
                rows_f32[2].astype(jnp.float32), jnp.int32
            ),
        ]
    else:
        rows = [
            jax.lax.bitcast_convert_type(r.astype(jnp.float32), jnp.int32)
            for r in rows_f32
        ]
    if fold_margin:
        # shared margin, rounded UP to a power of two, carried as the f32
        # exponent byte in a0's freed low bits; unfitted chunks (and chunk
        # 0, whose value comes from the exact row) keep a0q = 0 — their
        # Horner value is NaN-poisoned regardless, only the exponent byte
        # is live (chunk 0 still uses its measured delta)
        delta = jnp.maximum(delta_s, delta_t)
        mexp = jnp.clip(
            127.0 + jnp.ceil(jnp.log2(jnp.maximum(delta, 1.0))), 1.0, 254.0
        ).astype(jnp.int32)
        am = jnp.where(
            fitted, (a0q.astype(jnp.int32) << 8) | mexp, mexp
        )
        rows = [rows[0], jnp.pad(am, (0, LANES - n_chunks))]
    else:
        rows.append(jnp.pad(margins, (0, LANES - n_chunks)))
    rows.append(jax.lax.bitcast_convert_type(exact0, jnp.int32))
    # row degree+3: the GLOBAL max total threshold max_idx T(split+remove)
    # (one f32 value, every lane) — the candidate gate's bound.  A draw
    # with p24 >= this can never collide anywhere in the table, so the
    # kernel may drop such lanes from the undecided set: their raw margin
    # compares are already exact (val - delta_s <= T_s <= p24max <= p24
    # by margin soundness, and NaN chunks compare False), so gating them
    # out of the fallback sweep changes no outcome — it only stops
    # non-candidate tie/escapee lanes from buying fallback trips.
    # raw i32 count (<= 2^24), replicated across lanes; the kernel compares
    # in the integer domain (Mosaic rejects scalar tpu.bitcast, so the
    # bound never goes through f32)
    rows.append(jnp.full((LANES,), jnp.max(tt), jnp.int32))
    out = jnp.stack(rows, axis=0)
    n_rows = pl.cdiv(out.shape[0], 8) * 8
    return jnp.pad(out, ((0, n_rows - out.shape[0]), (0, 0)))


def chunk_bound(table):
    """Per-chunk max of (split + remove) as ONE 128-lane row (chunk c at
    lane c), f32-summed exactly as update_particles compares, so
    ``u >= bound[hi]`` proves no collision for the lane.  Requires
    n_chunks <= 128 (10000-bucket table -> 79)."""
    tot = (table[:, 0] + table[:, 1]).astype(jnp.float32)
    n = tot.shape[0]
    n_chunks = pl.cdiv(n, LANES)
    if n_chunks > LANES:
        raise ValueError(f"table too large for needband lookup: {n} buckets")
    pad = n_chunks * LANES - n
    per_chunk = jnp.max(jnp.pad(tot, (0, pad)).reshape(n_chunks, LANES), axis=1)
    return jnp.pad(per_chunk, (0, LANES - n_chunks)).reshape(1, LANES)


def _mobility_kernel(
    config: SimConfig,
    n_chunks: int,
    scal_ref,          # SMEM (2,): [poisson_step, t_steps]
    # 12 input field refs, 2 table refs, 12 output field refs,
    # 12 child refs, pushes counter — bound positionally below.
    *refs,
):
    SUBLANES, TILE = _tile_dims(config)
    n_f = len(FIELD_NAMES)
    in_refs = refs[:n_f]
    split_ref, remove_ref = refs[n_f : n_f + 2]
    out_refs = refs[n_f + 2 : 2 * n_f + 2]
    child_refs = refs[2 * n_f + 2 : 3 * n_f + 2]
    pushes_ref = refs[3 * n_f + 2]

    status0 = in_refs[9][:, :]
    unf0 = _is_unfinished(status0)
    tile_active = jnp.any(unf0)

    # Exact work counter (lanes actually advanced), accumulated across the
    # sequential tile sweep as a base-2^30 (lo, hi) i32 pair — f32 would
    # round beyond 2^24 (ADVICE r1).
    @pl.when(pl.program_id(0) == 0)
    def _init_pushes():
        pushes_ref[0] = 0
        pushes_ref[1] = 0

    @pl.when(jnp.logical_not(tile_active))
    def _passthrough():
        for r_in, r_out in zip(in_refs, out_refs):
            r_out[:, :] = r_in[:, :]
        # child validity is read from the staged status; zero just that one
        child_refs[9][:, :, :] = jnp.zeros(
            child_refs[9].shape, child_refs[9].dtype
        )

    @pl.when(tile_active)
    def _process():
        p_step = scal_ref[0].astype(jnp.uint32)
        t_steps = scal_ref[1]
        # this engine has no aux-table input; aux modes degrade to band0
        mode = (
            "band0"
            if config.lookup_mode
            in ("needband", "threshold", "pipeband", "staticguard",
                "staticfull", "staticfull2")
            or config.lookup_mode.startswith(("staticthresh", "polythresh"))
            else config.lookup_mode
        )
        lookup = make_chunked_lookup(
            n_chunks, mode, config.lookup_static_chunks
        )

        depth_iota = jax.lax.broadcasted_iota(
            jnp.int32, (config.spawn_depth, SUBLANES, LANES), 0
        )
        # Two field groups never enter the per-step staging loop (child
        # validity is the staged status, so non-spawn lanes' values are
        # never read):
        #   * acc is frozen across the phase and a child's acc equals its
        #     parent lane's — prefilled once here;
        #   * child genealogy ids are a pure function of the lane's parent
        #     id and the staged spawn step — reconstructed after the loop.
        unstaged = ("ax", "ay", "az", "id_hi", "id_lo")
        for name, r in zip(FIELD_NAMES, child_refs):
            if name in ("ax", "ay", "az"):
                f = FIELD_NAMES.index(name)
                r[:, :, :] = jnp.broadcast_to(
                    in_refs[f][:, :].astype(r.dtype)[None], r.shape
                )
            elif name not in unstaged:
                r[:, :, :] = jnp.zeros(r.shape, r.dtype)

        suspended0 = _is_suspended(status0)
        stamp0 = jnp.where(suspended0, _suspended_stamp(status0), status0)
        start0 = jnp.where(
            status0 == -1,
            1,
            jnp.where(
                status0 > 0,
                status0 + 1,
                jnp.where(suspended0, _suspended_resume(status0), jnp.int32(_INF_START)),
            ),
        )
        tile_first_t = jnp.min(jnp.where(unf0, start0, jnp.int32(_INF_START)))

        # acceleration and genealogy ids never mutate inside the phase —
        # closure constants, not loop carries (same hoist as worklog.py);
        # suspension is folded into the carried stamp (packed
        # _encode_suspended <= _SUS_BASE), so the loop carries 8 (S, L)
        # planes instead of 15
        a_const = tuple(in_refs[6 + i][:, :] for i in range(3))
        id_const = (in_refs[10][:, :], in_refs[11][:, :])

        # velocity-kick products are loop constants (acc never mutates)
        kick0 = make_kick(
            config.integrator,
            a_const,
            config.mobility_dt,
            in_refs[3].dtype,
            b_field=config.b_field,
        )

        def step_work(t, carry):
            px, py, pz, vx, vy, vz, stamp, depth, pushes = carry
            p = Particles(
                px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                ax=a_const[0], ay=a_const[1], az=a_const[2],
                status=stamp, id_hi=id_const[0], id_lo=id_const[1],
            )
            # within unf0 lanes the carried stamp is -1, >0, DEAD, or
            # packed-suspended: stamp >= -1 is live-and-not-suspended
            # exactly (empty-slot status 0 only occurs outside unf0)
            candidate = unf0 & (stamp >= -1) & (t >= start0)
            suspend_now = candidate & (depth >= config.spawn_depth)
            active = candidate & ~suspend_now
            res = update_particles(
                p,
                active=active,
                t=t,
                poisson_step=p_step,
                dt=config.mobility_dt,
                sim_size=config.sim_size,
                split_chance=None,
                remove_chance=None,
                seed=config.seed,
                rng_rounds=config.rng_rounds,
                rng_mode=config.rng_mode,
                integrator=config.integrator,
                collision_model=config.collision_model,
                table_lookup=functools.partial(lookup, split_ref, remove_ref, None),
                kick=kick0,
                boundary=config.boundary,
            )
            # active lanes always have depth < spawn_depth (suspension
            # pre-empts), so no child is ever dropped.
            sel = (depth_iota == depth[None]) & res.spawn[None]
            child = res.child
            for name, r in zip(FIELD_NAMES, child_refs):
                if name in unstaged:  # prefilled / reconstructed post-loop
                    continue
                val = getattr(child, name).astype(r.dtype)
                r[:, :, :] = jnp.where(sel, val[None], r[:, :, :])
            depth = depth + res.spawn.astype(jnp.int32)
            pushes = pushes + jnp.sum(active, dtype=jnp.int32)
            np_ = res.particles
            stamp_next = jnp.where(
                suspend_now, _encode_suspended(t, np_.status), np_.status
            )
            return (
                np_.px, np_.py, np_.pz, np_.vx, np_.vy, np_.vz,
                stamp_next, depth, pushes,
            )

        zeros = jnp.zeros((SUBLANES, LANES), jnp.int32)
        init = (
            jnp.maximum(tile_first_t, 1),
            *(r[:, :] for r in in_refs[:6]),
            stamp0,
            zeros,                       # depth
            jnp.zeros((), jnp.int32),    # pushes this pass
        )

        def loop_cond(carry):
            t = carry[0]
            stamp = carry[7]
            return (t <= t_steps) & jnp.any(unf0 & (stamp >= -1))

        def loop_body(carry):
            t = carry[0]
            out = step_work(t, carry[1:])
            return (t + 1,) + out

        final = jax.lax.while_loop(loop_cond, loop_body, init)[1:]
        (px, py, pz, vx, vy, vz, stamp, depth, tile_pushes) = final

        # Reconstruct the child id planes from (parent id, staged spawn
        # step): the same draw protocol physics used at the spawn step, so
        # the values are bit-identical to per-step staging.
        for d in range(config.spawn_depth):
            t_d = child_refs[9][d, :, :]
            c_hi, c_lo = rng.child_ids_at(
                config.rng_mode, config.seed, in_refs[10][:, :],
                in_refs[11][:, :], p_step,
                t_d.astype(jnp.uint32), rounds=config.rng_rounds,
            )
            child_refs[10][d, :, :] = c_hi
            child_refs[11][d, :, :] = c_lo
        lo = pushes_ref[0] + tile_pushes
        pushes_ref[0] = lo & ((1 << 30) - 1)
        pushes_ref[1] = pushes_ref[1] + (lo >> 30)

        # died (DEAD) and suspended (already packed) lanes keep their
        # carried stamp verbatim; survivors pack the finished encoding
        live_end = population.is_live(stamp)
        status_out = jnp.where(
            ~unf0, status0, jnp.where(live_end, _encode_finished(stamp), stamp)
        )
        # Inactive lanes pass through update_particles untouched, so every
        # non-status field in the carry already equals its input for lanes
        # that were not processed; only status needs the encode merge.
        vals = (px, py, pz, vx, vy, vz, *a_const, status_out, *id_const)
        for r_out, val in zip(out_refs, vals):
            r_out[:, :] = val

def _pad_tables(table):
    """(10000, 2) -> two (n_chunks, 128) f32 arrays, zero padded."""
    n = table.shape[0]
    n_chunks = pl.cdiv(n, LANES)
    pad = n_chunks * LANES - n
    t = jnp.pad(table, ((0, pad), (0, 0)))
    return t[:, 0].reshape(n_chunks, LANES), t[:, 1].reshape(n_chunks, LANES), n_chunks


@functools.partial(jax.jit, static_argnames=("config", "padded_capacity"))
def _sweep_pass(fields, table, scalars, config: SimConfig, padded_capacity: int):
    """One fused kernel sweep over all tiles; returns (new_fields, children)."""
    SUBLANES, TILE = _tile_dims(config)
    split2d, remove2d, n_chunks = _pad_tables(table)
    num_tiles = padded_capacity // TILE
    rows = padded_capacity // LANES

    field_block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    table_block = pl.BlockSpec(
        (n_chunks, LANES), lambda i, s: (0, 0), memory_space=pltpu.VMEM
    )
    child_block = pl.BlockSpec(
        (config.spawn_depth, SUBLANES, LANES),
        lambda i, s: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    out_shapes = (
        tuple(
            jax.ShapeDtypeStruct((rows, LANES), _field_dtype(n))
            for n in FIELD_NAMES
        )
        + tuple(
            jax.ShapeDtypeStruct(
                (config.spawn_depth, rows, LANES), _field_dtype(n)
            )
            for n in FIELD_NAMES
        )
        + (jax.ShapeDtypeStruct((2,), jnp.int32),)
    )
    out_specs = (
        tuple(field_block for _ in FIELD_NAMES)
        + tuple(child_block for _ in FIELD_NAMES)
        + (pl.BlockSpec(memory_space=pltpu.SMEM),)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[*(field_block for _ in FIELD_NAMES), table_block, table_block],
        out_specs=out_specs,
    )

    kernel = functools.partial(_mobility_kernel, config, n_chunks)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={i + 1: i for i in range(len(FIELD_NAMES))},
        interpret=jax.default_backend() != "tpu",
    )(scalars, *fields, split2d, remove2d)
    n_f = len(FIELD_NAMES)
    return outs[:n_f], outs[n_f : 2 * n_f], outs[2 * n_f]


def _state_to_fields(state: SimState, padded_capacity: int):
    c = state.capacity
    pad = padded_capacity - c

    def prep(a):
        if pad:
            a = jnp.pad(a, (0, pad))
        return a.reshape(padded_capacity // LANES, LANES)

    return tuple(
        prep(x)
        for x in (
            state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
            state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
            state.acc[:, 0], state.acc[:, 1], state.acc[:, 2],
            state.status, state.id_hi, state.id_lo,
        )
    )


def _fields_to_state(state: SimState, fields) -> SimState:
    c = state.capacity
    flat = [f.reshape(-1)[:c] for f in fields]
    return state._replace(
        pos=jnp.stack(flat[0:3], axis=1),
        vel=jnp.stack(flat[3:6], axis=1),
        acc=jnp.stack(flat[6:9], axis=1),
        status=flat[9],
        id_hi=flat[10],
        id_lo=flat[11],
    )


def _append_staged(fields, n, children, capacity, window):
    """Compact the (D, rows, LANES) staging buffers into slots [n, n+k) of
    the field-layout arrays.

    Validity = staged status > 0 (processed tiles zero their buffers before
    writing; skipped tiles zero the status plane)."""
    valid = (children[9] > 0).reshape(-1)
    packed = jnp.stack(
        [
            jax.lax.bitcast_convert_type(c.reshape(-1), jnp.int32)
            for c in children
        ],
        axis=1,
    )
    return population.append_packed_flat(
        fields, n, valid, packed, capacity, window
    )


def _staged_checks(state: SimState, config: SimConfig) -> None:
    if state.pos.dtype != jnp.float32:
        raise ValueError(
            "the fused Pallas engine is f32-only; use scheduler='sync' or "
            "'naive' for f64 oracle runs"
        )
    # Suspended status packs (resume step, spawn stamp) into 15 bits each;
    # beyond that the encoding would alias and corrupt physics (ADVICE r1).
    if config.poisson_timestep + 2 >= (1 << _STAMP_BITS):
        raise ValueError(
            f"poisson_timestep={config.poisson_timestep} exceeds the fused "
            f"engine's {_STAMP_BITS}-bit stamp domain; use scheduler='naive' "
            "or 'sync' for such runs"
        )


def _staged_layout(
    state: SimState, config: SimConfig, budget_bytes: int = 4 * 1024**3
):
    """Shared container geometry for the in-jit and host-chunked variants:
    (config with clamped spawn_depth, capacity, append window, padded
    field-layout capacity)."""
    c = state.capacity
    _, tile = _tile_dims(config)
    # window headroom: the fast append writes a full window at offset n;
    # padding beyond capacity absorbs the overhang without clamping.
    window = config.append_window or max(1 << 20, c // 4)
    window = min(window, c)
    padded_capacity = ((c + window + tile - 1) // tile) * tile
    # Child staging costs spawn_depth * padded_capacity * 48 B; clamp the
    # depth so it fits the staging budget (suspend/resume keeps physics
    # exact at ANY depth >= 1, shallower just means more sweeps).
    d_fit = max(1, budget_bytes // (padded_capacity * 48))
    if config.spawn_depth > d_fit:
        config = config.replace(spawn_depth=int(d_fit))
    return config, c, window, padded_capacity


def mobility_phase_dynamic(
    state: SimState, poisson_step, table, config: SimConfig, t_steps
):
    """Work-list fixed point over fused kernel sweeps (fully on device).

    Every sweep advances all unfinished lanes (fresh particles, children
    appended by earlier sweeps, suspended parents) as far as they can go;
    the loop ends when no lane is unfinished.  Exact for unbounded
    ionization chains; terminates because every suspended lane has staged
    >= spawn_depth children and resumes with an empty buffer.
    """
    _staged_checks(state, config)
    config, c, window, padded_capacity = _staged_layout(state, config)
    scalars = jnp.stack(
        [
            jnp.asarray(poisson_step, jnp.int32).astype(jnp.int32),
            jnp.asarray(t_steps, jnp.int32),
        ]
    )

    # Stay in the kernel's field layout across ALL sweeps (no per-pass
    # SimState round trips — traced as ~15 ms/pass of pure data movement).
    fields0 = _state_to_fields(state, padded_capacity)

    def cond(carry):
        fields, _n, _lo, _hi = carry
        return jnp.any(_is_unfinished(fields[9]))

    def body(carry):
        fields, n, lo, hi = carry
        new_fields, children, pass_pushes = _sweep_pass(
            fields, table, scalars, config, padded_capacity
        )
        fields, n = _append_staged(new_fields, n, children, c, window)
        lo_sum = lo + pass_pushes[0]
        hi = hi + pass_pushes[1] + (lo_sum >> 30)
        lo = lo_sum & ((1 << 30) - 1)
        return fields, n, lo, hi

    zero = jnp.zeros((), jnp.int32)
    fields, n, lo, hi = jax.lax.while_loop(
        cond, body, (fields0, state.n, zero, zero)
    )
    state = _fields_to_state(state, fields)._replace(n=n)
    # Decode finished markers back to the reference's status stamps.
    status = jnp.where(
        _is_finished(state.status), _decode_finished(state.status), state.status
    )
    return state._replace(status=status), {"pushes_lo": lo, "pushes_hi": hi}


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("config", "capacity", "window", "padded_capacity"),
)
def _staged_begin_jit(
    state: SimState,
    config: SimConfig, capacity: int, window: int, padded_capacity: int,
):
    # The post-grid state is DONATED: across the host-loop's dispatch
    # boundaries every live buffer counts against HBM (the in-jit phase
    # aliases these internally; the host variant must do so explicitly —
    # without donation the canonical dyn_old bucket OOMs the chip).
    return _state_to_fields(state, padded_capacity), state.n


@functools.partial(
    jax.jit, donate_argnums=(0,),  # only the field carry — the scalar
    # carries (n, lo, hi) are bytes, and donating the shared zero
    # constant twice is an Execute() error
    static_argnames=("config", "capacity", "window", "padded_capacity"),
)
def _staged_span_jit(
    fields, n, lo, hi, k, table, scalars,
    config: SimConfig, capacity: int, window: int, padded_capacity: int,
):
    """Up to ``k`` sweep passes of the work-list fixed point as ONE bounded
    dispatch.  ``k`` is traced, so a single compilation serves every chunk
    size.  Returns (fields, n, lo, hi, more): ``more`` is true while any
    lane is still unfinished — the host loop's continuation flag.

    The carry is DONATED: each dispatch's outputs reuse its inputs'
    buffers, so the field-layout arrays exist once, as in the in-jit
    phase, instead of doubling across the call boundary (HBM OOM at the
    canonical dyn_old bucket otherwise).  A faulted dispatch invalidates
    the carry, which is fine — the process dies and the row resumes from
    its per-Poisson-step snapshot."""

    def cond(carry):
        i, fields_, _n, _lo, _hi = carry
        return (i < k) & jnp.any(_is_unfinished(fields_[9]))

    def body(carry):
        i, fields_, n_, lo_, hi_ = carry
        new_fields, children, pass_pushes = _sweep_pass(
            fields_, table, scalars, config, padded_capacity
        )
        fields_, n_ = _append_staged(new_fields, n_, children, capacity, window)
        lo_sum = lo_ + pass_pushes[0]
        hi_ = hi_ + pass_pushes[1] + (lo_sum >> 30)
        lo_ = lo_sum & ((1 << 30) - 1)
        return i + 1, fields_, n_, lo_, hi_

    zero = jnp.zeros((), jnp.int32)
    _, fields, n, lo, hi = jax.lax.while_loop(
        cond, body, (zero, fields, n, lo, hi)
    )
    # piggybacked reclamation trigger: DEAD rows below n (the host loop
    # already blocks on this dispatch's outputs, so the extra scalar is a
    # free readback)
    P = padded_capacity
    slot = jax.lax.broadcasted_iota(jnp.int32, (P // 128, 128), 0) * 128 \
        + jax.lax.broadcasted_iota(jnp.int32, (P // 128, 128), 1)
    n_clamp = jnp.minimum(n, capacity)
    dead = jnp.sum(
        (fields[9] == STATUS_DEAD) & (slot < n_clamp), dtype=jnp.int32
    )
    return fields, n, lo, hi, jnp.any(_is_unfinished(fields[9])), dead


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("config", "capacity", "window", "padded_capacity"),
)
def _staged_reclaim_jit(
    fields, n,
    config: SimConfig, capacity: int, window: int, padded_capacity: int,
):
    """Mid-phase dead-slot reclamation in the staged field layout: drop
    DEAD rows, close ranks (stable), preserve every other status verbatim
    (unfinished -1 / spawn stamps > 0 / suspension packs / finished
    encodings all still carry meaning inside the fixed point).

    Physics-exact for the same reason population.reclaim is: draws are
    keyed by genealogy, never by slot, and tile assignment is just slot
    order.  Exists because the canonical dynamic_old T>=800 avalanche
    accumulates ~30M appended-then-died rows against ~1M live — the
    un-reclaimed bucket ladder OOMs the chip (STATUS.md) while the live
    population fits comfortably.

    Returns (fields, n_new, reclaimed)."""
    import jax.lax as lax

    P = padded_capacity
    slot = jnp.arange(P, dtype=jnp.int32)
    n_clamp = jnp.minimum(n, capacity)
    status = fields[9].reshape(-1)
    live = (slot < n_clamp) & (status != STATUS_DEAD) & (status != STATUS_EMPTY)
    perm, n_new = population.compaction_perm(live)
    reclaimed = n_clamp - n_new
    keep = slot < n_new
    src = jnp.where(keep, perm, P - 1)

    b = lambda a: lax.bitcast_convert_type(a, jnp.int32)
    packed = jnp.stack([b(f.reshape(-1)) for f in fields], axis=1)
    rows = packed.at[src].get(indices_are_sorted=True, mode="promise_in_bounds")
    rows = jnp.where(keep[:, None], rows, 0)
    # tuple, not list: the pytree structure must match _state_to_fields'
    # exactly or the next _staged_span_jit call mints a second compilation
    out = tuple(
        lax.bitcast_convert_type(rows[:, i], _field_dtype(name)).reshape(
            P // 128, 128
        )
        for i, name in enumerate(FIELD_NAMES)
    )
    return out, n_new, reclaimed


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("config", "capacity", "window", "padded_capacity"),
)
def _staged_end_jit(
    fields, n,
    config: SimConfig, capacity: int, window: int, padded_capacity: int,
):
    flat = [f.reshape(-1)[:capacity] for f in fields]
    state = SimState(
        pos=jnp.stack(flat[0:3], axis=1),
        vel=jnp.stack(flat[3:6], axis=1),
        acc=jnp.stack(flat[6:9], axis=1),
        status=flat[9], id_hi=flat[10], id_lo=flat[11],
        n=n,
    )
    # Decode finished markers back to the reference's status stamps.
    status = jnp.where(
        _is_finished(state.status), _decode_finished(state.status), state.status
    )
    return state._replace(status=status)


def mobility_phase_dynamic_host(
    state: SimState, poisson_step, table, config: SimConfig, t_steps,
    pass_chunk: int = 1, stop_on_overflow: bool = True,
):
    """mobility_phase_dynamic with the work-list fixed point driven as a
    HOST loop of bounded ``pass_chunk``-pass dispatches.

    Bit-exact vs the in-jit phase: the dispatches partition the identical
    pass sequence over the identical field-layout carry (which stays on
    device between calls) — only the loop driver moves to the host.

    Why it exists: the intermittent TPU worker fault's incidence grows with
    single-dispatch runtime (STATUS.md) — at the canonical 512^3 config a
    dynamic_old T>=800 Poisson step is one multi-minute dispatch and
    repeatedly faulted the worker (r3 poison ledger), while short
    dispatches have never faulted.  The per-dispatch continuation-flag
    readback (~0.2 s over the tunnel) is amortized over seconds-long
    passes.  Mirror of poisson_step_naive_host's fix for the naive tails.

    ``stop_on_overflow``: as in poisson_step_naive_host — when the caller
    redoes an overflowed step at a bigger bucket anyway, remaining passes
    are wasted work; at the TOP bucket the caller passes False and the
    fixed point runs to completion (accepted-overflow regime, reference
    src/pic.cu:544)."""
    _staged_checks(state, config)
    # Tighter staging budget than the in-jit phase: the span boundary
    # keeps the field carry alive on both sides of each dispatch (the
    # carry donation is reported unusable on this backend), so the 4 GiB
    # in-jit staging allowance OOM'd the chip at the canonical T=800
    # avalanche bucket (21M slots).  Shallower staging is physics-exact
    # (suspend/resume), it just takes more passes.
    config, c, window, padded_capacity = _staged_layout(
        state, config, budget_bytes=1 * 1024**3
    )
    statics = dict(
        config=config, capacity=c, window=window,
        padded_capacity=padded_capacity,
    )
    scalars = jnp.stack(
        [
            jnp.asarray(poisson_step, jnp.int32).astype(jnp.int32),
            jnp.asarray(t_steps, jnp.int32),
        ]
    )
    fields, n = _staged_begin_jit(state, **statics)
    del state  # donated to _staged_begin_jit
    zero = jnp.zeros((), jnp.int32)
    lo, hi = zero, zero
    reclaimed = zero
    k = jnp.asarray(pass_chunk, jnp.int32)
    from ..step import _RECLAIM_MIN  # tests monkeypatch it; read live
    while True:
        fields, n, lo, hi, more, dead = _staged_span_jit(
            fields, n, lo, hi, k, table, scalars, **statics
        )
        if not bool(more):
            break
        if stop_on_overflow and int(n) > c:
            break  # overflow: the caller redoes at a bigger bucket
        # Reclaim DEAD rows between spans once they dominate: the canonical
        # T>=800 avalanche's cumulative churn (~30M dead against ~1M live)
        # otherwise climbs the bucket ladder past HBM (STATUS.md OOM).
        # Skipped in the accepted-overflow regime (n > c) to stay
        # bit-exact with the in-jit phase's drop accounting.
        if int(n) <= c and int(dead) >= max(_RECLAIM_MIN, int(n) // 4):
            fields, n, r = _staged_reclaim_jit(fields, n, **statics)
            reclaimed = reclaimed + r
    state = _staged_end_jit(fields, n, **statics)
    return state, {"pushes_lo": lo, "pushes_hi": hi, "reclaimed": reclaimed}
