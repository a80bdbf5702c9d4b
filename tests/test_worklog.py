"""Work-log engine (ops/pallas/worklog.py) equivalence and invariants.

The engine must be bit-exact vs the sync oracle (the reference's
runUnitTest contract, src/test.cu:43-101) for any spawn depth / tile shape,
including configs that force suspension -> relocation chains, and its
self-compacted output must satisfy the all-live-prefix invariant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.constants import STATUS_ALIVE
from particle_simulation_tpu.cross_section import bundled_paths, load_table
from particle_simulation_tpu.ops.step import poisson_step
from particle_simulation_tpu.runtime import sorted_particle_array


def run_steps(cfg, table):
    state = setup_particles(cfg)
    metrics = []
    for t in range(cfg.poisson_steps):
        state, m = poisson_step(state, jnp.uint32(t), table, cfg)
        metrics.append(
            {
                "n": int(m["n"]),
                "added": int(m["added"]),
                "removed": int(m["removed"]),
                "overflow": bool(m["overflow"]),
                "pushes": int(m["pushes_lo"]) + (int(m["pushes_hi"]) << 30),
            }
        )
    return state, metrics


BASE = SimConfig(
    init_n=200,
    capacity=4096,
    poisson_steps=2,
    poisson_timestep=6,
    grid_size=(16, 16, 16),
    kernel_sublanes=8,
)


@pytest.mark.parametrize(
    "cfg",
    [
        BASE.replace(spawn_depth=2),
        # interpret-mode runs cost ~45-55 s each on this 1-CPU box; the
        # d2 case is the default-suite representative, the rest are the
        # full matrix (pytest -m slow)
        pytest.param(BASE.replace(spawn_depth=1), marks=pytest.mark.slow),
        pytest.param(
            BASE.replace(kernel_sublanes=16, poisson_timestep=9),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            BASE.replace(init_n=97, capacity=2048, worklog_rows=16),
            marks=pytest.mark.slow,
        ),
        # the guarded static lookup skips statically unrolled chunk visits
        # by a per-step band cond — must stay bit-exact vs the oracle
        # (r4 suite split: non-default lookup modes run in the slow lane;
        # the default lane keeps d2 + the polythresh default engine)
        pytest.param(
            BASE.replace(lookup_mode="staticguard", lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        # merged tail (r3f flip candidate): escapees join the exact tie
        # sweep; low static_chunks forces many escapees through it
        pytest.param(
            BASE.replace(lookup_mode="staticthresh_m", lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            BASE.replace(lookup_mode="staticthresh_m", lookup_hits=True,
                         lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        # wave-unrolled dynamic tails (W=3 over the wide escapee band:
        # multi-wave trips + padding visits) — pure rescheduling of the
        # same gathers, must stay bit-exact
        pytest.param(
            BASE.replace(lookup_mode="staticthresh_m", lookup_static_chunks=3,
                         lookup_tail_waves=3),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            BASE.replace(lookup_static_chunks=3, lookup_tail_waves=3),
            marks=pytest.mark.slow,
        ),
        # full-24-bit threshold compare (no tie fallback): the r3e
        # candidate; low static_chunks forces its dynamic over-tail too
        pytest.param(
            BASE.replace(lookup_mode="staticfull", lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            BASE.replace(lookup_mode="staticfull", lookup_hits=True,
                         lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            BASE.replace(lookup_mode="staticfull2", lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        # boolean lookup protocol (decided hits instead of f32
        # pseudo-chances) — bit-exact by the threshold exactness argument
        pytest.param(
            BASE.replace(lookup_hits=True, lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        # hits x guard: the A/B combo candidate (band-gated static visits
        # returning booleans) — must stay bit-exact before it can win
        pytest.param(
            BASE.replace(lookup_hits=True, lookup_mode="staticguard",
                         lookup_static_chunks=3),
            marks=pytest.mark.slow,
        ),
        # pipeband: the only mode that carries band scalars through the
        # T-loop (they are dropped from the carry in every other mode)
        pytest.param(
            BASE.replace(lookup_mode="pipeband"), marks=pytest.mark.slow
        ),
        # start-bucketed work-log emission (4 segment logs routed by first
        # execution step) — pure rescheduling, must stay bit-exact
        pytest.param(
            BASE.replace(worklog_start_buckets=4, poisson_timestep=9),
            marks=pytest.mark.slow,
        ),
        # buckets x suspension churn: resume records route by resume step
        pytest.param(
            BASE.replace(spawn_depth=1, worklog_start_buckets=4),
            marks=pytest.mark.slow,
        ),
        # horizon sweeps: each pass advances at most K steps, live lanes
        # re-emit via the suspension packing, modular window routing —
        # pure rescheduling, must stay bit-exact (probe_horizon.py design)
        pytest.param(
            BASE.replace(worklog_horizon=3, worklog_start_buckets=4),
            marks=pytest.mark.slow,
        ),
        # window-aligned horizon (resumes cluster at window boundaries)
        pytest.param(
            BASE.replace(worklog_horizon=3, worklog_align=True,
                         worklog_start_buckets=2, poisson_timestep=8),
            marks=pytest.mark.slow,
        ),
        # horizon x suspension churn: both re-emission kinds share the
        # packed encoding; K=2 forces a window boundary between them
        pytest.param(
            BASE.replace(spawn_depth=1, worklog_horizon=2,
                         worklog_start_buckets=4),
            marks=pytest.mark.slow,
        ),
        # horizon on a single mixed log (inefficient but legal)
        pytest.param(
            BASE.replace(worklog_horizon=4), marks=pytest.mark.slow
        ),
        # polynomial-fit thresholds (pack_poly_thresholds): per-chunk Horner
        # evaluation decides the comparisons, measured margins route
        # boundary lanes to the exact fallback — must stay bit-exact vs the
        # oracle (the constant table fits perfectly, exercising the decided
        # path; the sine-table case below exercises realistic fits)
        BASE.replace(lookup_mode="polythresh"),
        pytest.param(
            BASE.replace(lookup_mode="polythresh", lookup_hits=True),
            marks=pytest.mark.slow,
        ),
        pytest.param(
            BASE.replace(lookup_mode="polythresh", lookup_poly_degree=5),
            marks=pytest.mark.slow,
        ),
        # candidate gate (the r4 default engine): non-candidate lanes
        # dropped from the fallback set — the 50/50 const table makes
        # every lane a candidate (bound = 2^24), so the gate must be a
        # provable no-op here; the sine table growth test below exercises
        # the active gate
        BASE.replace(lookup_mode="polythresh", lookup_cand_gate=True),
        # bf16-packed coefficient row (4 aux gathers instead of 5): the
        # constant table fits exactly even after rounding, exercising the
        # packed decided path in-engine
        # the SHIPPED engine family (pack + wide window, fold off) stays
        # in the default lane
        BASE.replace(lookup_mode="polythresh", lookup_poly_degree=2,
                     lookup_poly_pack=True),
        # margin-fold (3 aux gathers, the r5 rung — measured SLOWER on
        # chip, kept as a flag): a0 quantized + shared power-of-two
        # margin in its low byte — const table fits exactly, exercising
        # the folded decided path in-engine
        pytest.param(
            BASE.replace(lookup_mode="polythresh", lookup_poly_degree=2,
                         lookup_poly_pack=True, lookup_margin_fold=True),
            marks=pytest.mark.slow,
        ),
        # spawn-guard: the child-staging select+store block runs under a
        # per-step any(spawn) branch — skipped stores must never be ones a
        # spawn needed, so the multiset must stay bit-exact
        pytest.param(
            BASE.replace(worklog_spawn_guard=True),
            marks=pytest.mark.slow,
        ),
        # spawn-guard x suspension: depth is read inside the guarded block;
        # d1 forces suspend/resume churn around the guarded stores
        pytest.param(
            BASE.replace(worklog_spawn_guard=True, spawn_depth=1),
            marks=pytest.mark.slow,
        ),
    ],
    ids=["d2", "d1-suspend", "s16-t9", "odd-small-log", "staticguard",
         "merged", "merged-hits", "merged-waves", "waves",
         "staticfull", "staticfull-hits", "staticfull2",
         "hits", "hits-guard", "pipeband", "bucketed", "bucketed-suspend",
         "horizon", "horizon-aligned", "horizon-suspend", "horizon-mixed",
         "polythresh", "polythresh-hits", "polythresh-d5",
         "polythresh-cgate", "polythresh-pack", "polythresh-fold",
         "spawn-guard", "spawn-guard-suspend"],
)
def test_worklog_matches_sync_oracle(cfg, const_table):
    oracle_state, oracle_m = run_steps(cfg.replace(scheduler="sync"), const_table)
    wl_state, wl_m = run_steps(cfg.replace(scheduler="dynamic"), const_table)
    assert wl_m == oracle_m
    np.testing.assert_array_equal(
        sorted_particle_array(wl_state), sorted_particle_array(oracle_state)
    )


@pytest.mark.parametrize(
    "lookup_mode,cand_gate,pack,fold",
    [pytest.param("staticthresh", False, False, False,
                  marks=pytest.mark.slow),
     # realistic fits: the sine table's fitted prefix decides most lanes,
     # margin/escapee lanes exercise the fallback inside the engine
     pytest.param("polythresh", False, False, False,
                  marks=pytest.mark.slow),
     # candidate gate ACTIVE: the sine table's bound (max total ~10%)
     # excludes ~90% of lanes per step from the fallback set — the
     # multiset must stay bit-exact vs the oracle (slow since the r4d
     # pack flip made this a non-default engine)
     pytest.param("polythresh", True, False, False,
                  marks=pytest.mark.slow),
     # packed coefficients on the REAL table (the SHIPPED engine):
     # bf16-widened margins route more lanes to the fallback, outcomes
     # must stay bit-exact
     ("polythresh", True, True, False),
     # margin-fold on the REAL table (measured slower on chip; flag):
     # shared power-of-two margins widen further, outcomes must stay
     # bit-exact
     pytest.param("polythresh", True, True, True,
                  marks=pytest.mark.slow)],
)
def test_worklog_sine_table_growth(sine_table, lookup_mode, cand_gate, pack,
                                   fold):
    # the default table needs velocity spread before collisions kick in;
    # run longer so the growth regime is exercised
    cfg = BASE.replace(poisson_steps=3, poisson_timestep=8, init_n=500,
                       lookup_mode=lookup_mode, lookup_cand_gate=cand_gate,
                       lookup_poly_pack=pack, lookup_margin_fold=fold)
    oracle_state, oracle_m = run_steps(cfg.replace(scheduler="sync"), sine_table)
    wl_state, wl_m = run_steps(cfg.replace(scheduler="dynamic"), sine_table)
    assert wl_m == oracle_m
    np.testing.assert_array_equal(
        sorted_particle_array(wl_state), sorted_particle_array(oracle_state)
    )


def test_worklog_output_is_compacted(const_table):
    """Self-compacting contract: all lanes in [0, n) live and ALIVE, all
    lanes beyond EMPTY (no holes — n is the exact live count)."""
    cfg = BASE.replace(scheduler="dynamic")
    state, metrics = run_steps(cfg, const_table)
    n = int(state.n)
    status = np.asarray(state.status)
    assert n == metrics[-1]["n"]
    assert (status[:n] == STATUS_ALIVE).all()
    assert (status[n:] == 0).all()


@pytest.mark.slow
def test_worklog_overflow_flag(const_table):
    """Growth beyond capacity must flag overflow (children still counted:
    reference drop-but-count semantics, src/pic.cu:127-131,543-545).

    The draw protocol is PINNED: whether this tiny config avalanches past
    capacity depends on the actual draws (under the block2 default it
    happens to die back to 192 and never overflows) — the flag mechanism
    under test is protocol-independent, the workload is not."""
    cfg = BASE.replace(
        scheduler="dynamic", init_n=220, capacity=256, poisson_steps=1,
        poisson_timestep=6, rng_mode="perstep",
    )
    state, metrics = run_steps(cfg, const_table)
    assert metrics[-1]["overflow"]
    assert int(state.n) <= cfg.capacity


def test_worklog_rejects_oversized_timestep(const_table):
    cfg = BASE.replace(scheduler="dynamic", poisson_timestep=40000)
    state = setup_particles(cfg)
    with pytest.raises(ValueError, match="stamp domain"):
        poisson_step(state, jnp.uint32(0), const_table, cfg)


def test_staged_engine_rejects_oversized_tile(const_table):
    """The staged engine's tile ceiling (scoped VMEM 18.17M > 16M at 256
    sublanes, out/data/kernel_tile_sweep.csv) must fail as a one-line
    pre-flight ValueError, not a Mosaic compile abort (VERDICT r3 weak #5);
    the worklog engine compiles at 256 and must NOT be rejected."""
    cfg = BASE.replace(scheduler="dynamic_old", kernel_sublanes=256)
    state = setup_particles(cfg)
    with pytest.raises(ValueError, match="tile ceiling"):
        poisson_step(state, jnp.uint32(0), const_table, cfg)
    # the worklog engine's slimmer carry is allowed through
    cfg_ok = BASE.replace(scheduler="dynamic", kernel_sublanes=256)
    from particle_simulation_tpu.ops.step import _check_stamp_domain

    _check_stamp_domain(cfg_ok)  # must not raise
