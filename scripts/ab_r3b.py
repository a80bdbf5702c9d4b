"""A/B the round-3b kernel candidates at the bench point (real chip).

Variants over the bench config (1M electrons, cap 2M, T=100, 256^3):
  * base         — round-3 shipped config (staticthresh, 1 mixed work log)
  * guard        — lookup_mode=staticguard (band-gated static visits)
  * seg2/seg4/seg8 — start-bucketed work-log emission
  * guard+seg4   — combined
  * hor32/hor32A/... — horizon sweeps (probe_horizon.py: bounds post-death
    idle slots; predicted 45 -> ~30-35 ms mobility at the bench point)
  * sguard        — any(spawn)-branched child staging (skips 7xD
    select+stores on the spawnless majority of tile-steps)
Each: 3 warm Poisson steps then N windows of 3 steps; prints best window
pushes/s per variant.  Run ONLY on an idle chip (single-tenant).

    python scripts/ab_r3b.py [variant ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.cross_section import load_table
from particle_simulation_tpu.ops.step import poisson_loop
from particle_simulation_tpu.runtime import _bucket_size, _slice_state

WARM, STEPS, WINDOWS = 3, 3, 3

BASE = SimConfig(
    init_n=1_000_000,
    capacity=2_000_000,
    poisson_steps=WARM + WINDOWS * STEPS,
    poisson_timestep=100,
    grid_size=(256, 256, 256),
    scheduler="dynamic",
)

# run order = dict order: the ab queue phase has a bounded time budget, so
# the highest-information variants go first
VARIANTS = {
    "base": {},
    # the pre-r3i default engine, pinned (after the r3i flip `base` means
    # polythresh deg2 — keep the old anchor addressable for regression A/Bs)
    "stthresh": {"lookup_mode": "staticthresh"},
    # horizon sweeps (probe_horizon.py): K-step windows + modular routing
    # bound post-death idle slots (predicted 45 -> ~30-35 ms mobility)
    "hor32A": {
        "worklog_horizon": 32,
        "worklog_align": True,
        "worklog_start_buckets": 4,
    },
    "hor32": {"worklog_horizon": 32, "worklog_start_buckets": 4},
    # boolean lookup protocol: ~4 fewer vector ops/step in the T-loop
    "hits+guard": {"lookup_hits": True, "lookup_mode": "staticguard"},
    # the full-stack candidate: horizon x band-gated boolean lookups
    "hor32A+hits+guard": {
        "worklog_horizon": 32,
        "worklog_align": True,
        "worklog_start_buckets": 4,
        "lookup_hits": True,
        "lookup_mode": "staticguard",
    },
    "hor24A": {
        "worklog_horizon": 24,
        "worklog_align": True,
        "worklog_start_buckets": 4,
    },
    "hits": {"lookup_hits": True},
    # spawn-guard: per-step any(spawn) branch around the child-staging
    # select+store block (spawns are rare per tile-step at the bench point)
    "sguard": {"worklog_spawn_guard": True},
    "hor32A+hits+guard+sguard": {
        "worklog_horizon": 32,
        "worklog_align": True,
        "worklog_start_buckets": 4,
        "lookup_hits": True,
        "lookup_mode": "staticguard",
        "worklog_spawn_guard": True,
    },
    "guard": {"lookup_mode": "staticguard"},
    "seg2": {"worklog_start_buckets": 2},
    "seg4": {"worklog_start_buckets": 4},
    "seg8": {"worklog_start_buckets": 8},
    "guard+seg4": {"lookup_mode": "staticguard", "worklog_start_buckets": 4},
    # retry of the tile-height ceiling now that the T-loop carries slimmed
    "s256": {"kernel_sublanes": 256},
    "hits+seg4": {"lookup_hits": True, "worklog_start_buckets": 4},
    "hits+guard+seg4": {
        "lookup_hits": True,
        "lookup_mode": "staticguard",
        "worklog_start_buckets": 4,
    },
    # round-3c re-runs after the i1-select fix: hits stacked on the
    # spawn-guard (which tied base bit-exactly in the first A/B round)
    "hits+sguard": {"lookup_hits": True, "worklog_spawn_guard": True},
    "hits+guard+sguard": {
        "lookup_hits": True,
        "lookup_mode": "staticguard",
        "worklog_spawn_guard": True,
    },
    # round-3d: T-loop unroll (halves the loop-carry VMEM round-trips —
    # the measured dominant spill cost) and the pair-fused cipher on top
    # (one Threefry block per step pair; the cipher is most of the 16 ms
    # physics floor).  unroll2 is bit-exact vs base; block2 is a DIFFERENT
    # (equally valid) draw stream — final_n legitimately diverges from the
    # perstep group (tests/test_rng_modes.py pins cadence equivalence).
    "unroll2": {"worklog_unroll": 2},
    "block2": {"rng_mode": "block2", "worklog_unroll": 2},
    "block2+sguard": {
        "rng_mode": "block2",
        "worklog_unroll": 2,
        "worklog_spawn_guard": True,
    },
    "block2u1": {"rng_mode": "block2"},  # control: new stream, old loop
    # round-3e: quarter the loop-carry round-trips (two pair blocks per
    # fori iteration); same block2 stream, bit-exact vs unroll 2
    "block2u4": {"rng_mode": "block2", "worklog_unroll": 4},
    # TIMING PROBE (wrong physics, final_n diverges by design): no table
    # traffic at all — the upper bound for event-skipping lookup schemes
    "probeconst": {"lookup_mode": "probeconst"},
    # round-3e lookup-cost attribution (probeconst = 2.5x base): which part
    # of the lookup costs — the 9 static gathers, the over-tail dynamic
    # sweep + bound reductions, or the tie-fallback sweep + reductions?
    # floor2/noover/noties are probes (physics off by ~2^-16/lane);
    # statichybrid is EXACT physics (2 f32 gathers/visit, no tie machinery)
    "st_noties": {"lookup_mode": "staticthresh_noties"},
    "st_noover": {"lookup_mode": "staticthresh_noover"},
    "st_floor2": {"lookup_mode": "staticthresh_floor2"},
    "shybrid": {"lookup_mode": "statichybrid"},
    # EXACT candidate: full-24-bit threshold compare, 2 gathers/visit,
    # zero tie machinery (only the over-tail stays dynamic)
    "sfull": {"lookup_mode": "staticfull"},
    "sfull+hits": {"lookup_mode": "staticfull", "lookup_hits": True},
    # staticfull with the over-tail cond-gated behind one max-reduce
    "sfull2": {"lookup_mode": "staticfull2"},
    "sfull2+hits": {"lookup_mode": "staticfull2", "lookup_hits": True},
    # round-3f: widen the static window so the live band never escapes it.
    # st_noover measured the over-tail's true cost (1.153e9 best AND flat
    # windows vs base's 1.12->0.86 degradation: the band drifts past K=8
    # during the run and every escaped step pays dynamic-trip visits at ~2x
    # a static visit).  These stay EXACT: the over-tail remains, zero-trip
    # whenever the window covers the band.
    "k10": {"lookup_static_chunks": 10},
    "k12": {"lookup_static_chunks": 12},
    "k16": {"lookup_static_chunks": 16},
    "k12u4": {"lookup_static_chunks": 12, "worklog_unroll": 4},
    # round-3f: merged tail (EXACT) — band escapees join the exact f32 tie
    # sweep, so each step pays ONE reduction pair + loop setup instead of
    # two.  The probes price the tie machinery at ~9% and the over-tail at
    # ~5%; stm should recover roughly half of both, stacking with k12's
    # escape-rate reduction.
    "stm": {"lookup_mode": "staticthresh_m"},
    "stm+k12": {"lookup_mode": "staticthresh_m", "lookup_static_chunks": 12},
    "stm+k16": {"lookup_mode": "staticthresh_m", "lookup_static_chunks": 16},
    # round-3f: wave-unrolled dynamic tails — the k-sweep showed the late-
    # window degradation is a WIDE SPARSE escapee band (window widening
    # loses ~1.5%/visit and barely helps), so attack the per-trip cost
    # instead: W visits per fori trip = 1/W the carry round-trips.
    "w4": {"lookup_tail_waves": 4},
    "stm+w4": {"lookup_mode": "staticthresh_m", "lookup_tail_waves": 4},
    "stm+w8": {"lookup_mode": "staticthresh_m", "lookup_tail_waves": 8},
    # round-3g: square one-hot factorization of the bbox deposit histogram
    # (microbench_mxu_hist.py: build cost 1024 vs 2176 elems/particle)
    "h512": {"bbox_hist_lanes": 512},
    "h256": {"bbox_hist_lanes": 256},
    # round-3h: unroll-4 re-test on top of the flipped defaults (r3f saw
    # block2u4 at 1.142e9 once, r3c at 1.121 — decide with fresh anchors)
    "u4": {"worklog_unroll": 4},
    # round-3i: polynomial-fit thresholds (EXACT; pack_poly_thresholds) —
    # degree+2 single-row lane-LUT gathers + Horner replace the 9 static
    # chunk gathers + selects AND the over-tail machinery (escapees are
    # NaN-undecided into the tie sweep); the fitted window spans ~21 chunks
    # vs staticthresh's 8, so late-window band drift stays decided.
    "poly": {"lookup_mode": "polythresh"},
    "poly3": {"lookup_mode": "polythresh", "lookup_poly_degree": 3},
    # TIMING PROBE (wrong physics on margin/escapee lanes): poly path with
    # no undecided reductions and no fallback sweep — prices the fixed poly
    # cost against st_floor2's 1.31e9 static floor
    "polyfloor": {"lookup_mode": "polythresh_floor"},
    "polyfloor3": {"lookup_mode": "polythresh_floor", "lookup_poly_degree": 3},
    "poly2": {"lookup_mode": "polythresh", "lookup_poly_degree": 2},
    "poly1": {"lookup_mode": "polythresh", "lookup_poly_degree": 1},
    "poly0": {"lookup_mode": "polythresh", "lookup_poly_degree": 0},
    "poly2+hits": {"lookup_mode": "polythresh", "lookup_poly_degree": 2,
                   "lookup_hits": True},
    "poly3+hits": {"lookup_mode": "polythresh", "lookup_poly_degree": 3,
                   "lookup_hits": True},
    "poly5": {"lookup_mode": "polythresh", "lookup_poly_degree": 5},
    "poly+hits": {"lookup_mode": "polythresh", "lookup_hits": True},
    # TIMING PROBES (wrong physics) pricing the energy_to_index chain:
    # probeidx - probeconst = the log10/trunc/clip bucketing alone;
    # bitfloor - polyfloor = bucketing chain minus bitcast-exponent chain
    # (the ceiling of an exact bitcast-indexed poly redesign).
    "probeidx": {"lookup_mode": "probeidx"},
    # carry-cut ladder continuation (u2 1.101e9 -> u4 1.157e9): does the
    # round-trip amortization beat the code-size spill cost one more time?
    "u8": {"worklog_unroll": 8},
    "bitfloor": {"lookup_mode": "polythresh_bitfloor",
                 "lookup_poly_degree": 2},
    # round-3j: candidate gate (EXACT) — tie/escapee lanes only join the
    # fallback sweep when their draw can actually collide (p24 < global
    # max total threshold, ~10% for the sine table).  One compare + and
    # per step; polyfloor deg2 (1.456e9) vs poly exact (1.25e9) prices
    # the whole fallback machinery at ~16%, and the trips are the
    # late-window dominator.
    "cgate": {"lookup_cand_gate": True},
    "cgate+u8": {"lookup_cand_gate": True, "worklog_unroll": 8},
    # round-4: live-prefix chunked grid phase (EXACT) — deposit tiles and
    # gather chunks past the compacted prefix n are lax.cond-skipped; at
    # the settled 2M bucket with ~0.7-1M live, roughly half the grid
    # phase's MXU tiles and gather rows are dead weight (grid phase =
    # 17.3 ms of the 57.7 ms step, STATUS.md anatomy).
    "gchunk": {"grid_live_chunks": 16},
    "gchunk8": {"grid_live_chunks": 8},
    "gchunk32": {"grid_live_chunks": 32},
    # round-4: bf16-packed coefficient row (EXACT; margins re-measured
    # against the rounded evaluation) — 4 aux gathers/step instead of 5.
    # The r4 probe ladder prices the poly path's gathers at ~37% of the
    # loop; the risk is the bf16-widened margins (delta_t 567 -> 922)
    # buying extra fallback trips — watch the late windows.
    "ppack": {"lookup_poly_pack": True},
    # round-5: margin row folded into a0 (3 aux gathers, EXACT — shared
    # power-of-two margins measured against the quantized evaluation).
    # The probe ladder prices the remaining poly gathers at ~37% of the
    # loop; the r4d pack flip (5 -> 4 gathers) bought +3%, this rung
    # (4 -> 3) targets the same cut.  Risk: wider shared margins buy
    # fallback trips — watch the late windows.
    "mfold": {"lookup_margin_fold": True},
    # round-5 late-window escapee attack: extend the polythresh fitted
    # window from sine chunks 1..10 to 1..22 by raising the fit-error cap
    # to the 16-bit margin ceiling — ZERO extra gathers, fat-but-sound
    # margins.  Escapee lanes trip the fallback on ~9% of draws (the
    # cand-gate pass rate); fat-margin fitted lanes only inside the
    # margin (~0.6%) — the late windows heat into exactly chunks 11..22.
    "wide": {"lookup_poly_err_cap": 60000.0},
    "wide+mfold": {"lookup_poly_err_cap": 60000.0,
                   "lookup_margin_fold": True},
    # round-5: minimax (Lawson) fit — margins shrink 1.4-2x and the
    # fitted window gains two chunks at zero kernel cost; targets the
    # remaining late-window tie rate in the fat chunks
    "mmax": {"lookup_poly_fit": "minimax"},
}


def _bucket_hint():
    """Start every variant at the bucket the headline bench settled at
    (out/data/bench_bucket_hint.json, written by bench.py): the climb from
    the natural first bucket costs two extra ~minutes compiles per variant
    through the remote-compile tunnel and lands at the same place."""
    import json

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "out", "data", "bench_bucket_hint.json",
    )
    try:
        with open(path) as f:
            return int(json.load(f)["w"])
    except (OSError, ValueError, KeyError, TypeError):
        return 0


def run_variant(name, overrides, table):
    config = BASE.replace(**overrides)
    w = max(_bucket_size(config.init_n, config.capacity),
            min(_bucket_hint(), config.capacity))
    full = setup_particles(config)
    while True:
        state = _slice_state(full, w) if w < config.capacity else full
        cfg_w = config.replace(capacity=w)
        t0 = time.perf_counter()
        state, m0 = poisson_loop(state, table, cfg_w, WARM, first_index=0)
        _ = int(state.n)
        warm_s = time.perf_counter() - t0
        rates, overflow = [], bool(jnp.any(m0["overflow"]))
        idx = WARM
        for _ in range(WINDOWS):
            t0 = time.perf_counter()
            state, m = poisson_loop(state, table, cfg_w, STEPS, first_index=idx)
            _ = int(state.n)
            el = time.perf_counter() - t0
            idx += STEPS
            pushes = sum(
                int(l) + (int(h) << 30)
                for l, h in zip(m["pushes_lo"], m["pushes_hi"])
            )
            overflow |= bool(jnp.any(m["overflow"]))
            rates.append(pushes / el)
        if w < config.capacity and overflow:
            w = _bucket_size(w + 1, config.capacity)
            continue
        break
    final_n = int(state.n)
    print(
        f"{name:12s} warm {warm_s:6.1f}s  best {max(rates):.4g} pushes/s  "
        f"all {[f'{r:.3g}' for r in rates]}  final_n={final_n}",
        flush=True,
    )
    return max(rates), final_n


def main():
    names = sys.argv[1:] or list(VARIANTS)
    table = load_table()
    results, finals = {}, {}
    for name in names:
        # a variant that fails to lower (Mosaic rejects a construct the
        # interpret-mode tests can't catch) must not sink the rest of the
        # bounded-budget A/B phase
        try:
            results[name], finals[name] = run_variant(
                name, VARIANTS[name], table
            )
        except Exception as e:  # noqa: BLE001 — report and move on
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}", flush=True)
    # within a draw protocol every variant is bit-exact physics by
    # construction — a divergent final population means a miscompiled
    # variant, which must never win.  Across protocols (rng_mode) the
    # streams differ by design, so consistency is checked per group.
    def group(name):
        return VARIANTS[name].get("rng_mode", "perstep")

    bad = set()
    for g in {group(n) for n in finals}:
        members = {n: f for n, f in finals.items() if group(n) == g}
        if len(set(members.values())) > 1:
            print(f"WARNING: final_n DIVERGES within group {g!r}: {members}")
            anchor = min(members)  # deterministic; base sorts first in its group
            anchor = "base" if "base" in members else anchor
            bad |= {n for n, f in members.items() if f != members[anchor]}
    if bad:
        results = {n: r for n, r in results.items() if n not in bad}
        print(f"excluding group-divergent variants: {sorted(bad)}")
    if not results:
        print("no variant completed")
        return
    best = max(results, key=results.get)
    print(f"winner: {best} at {results[best]:.4g} pushes/s")


if __name__ == "__main__":
    main()
