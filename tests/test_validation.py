"""External physics validation (VERDICT r4 #6): tie the collision pipeline
to expectations computed OUTSIDE the engines.

All previous validation was internal (4 engines vs each other, f32 vs f64).
These tests anchor the pipeline to first-principles statistics:

  * constant tables make each mobility step an independent Galton-Watson
    branching step per particle (split -> 2, remove -> 0, else -> 1 with
    the table's stated probabilities; children join the NEXT step, exactly
    the reference's timestamp protocol, /root/reference/src/particle_move.cu:62-74)
    -- the population trajectory must match the analytic mean within
    Monte-Carlo bounds;
  * for the bundled sine table, realized per-particle split/remove outcomes
    of an end-to-end run must be binomially consistent with the table's
    chance at each particle's realized collision energy (chi-square over
    energy groups; the reference's weaker cousin is the RNG histogram,
    /root/reference/analyse/analyse_random.py:4-22).

Both runs are seeded and single-threaded-deterministic, so the stochastic
bounds are stable in CI.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from particle_simulation_tpu import SimConfig
from particle_simulation_tpu.cross_section import (
    N_STEPS,
    bundled_paths,
    load_table,
    write_table,
)
from particle_simulation_tpu.runtime import run_pic
from particle_simulation_tpu.state import setup_particles


def branching_moments(n0, split_pct, remove_pct, n_steps):
    """Analytic (mean, variance) of the population after ``n_steps``
    mobility steps of the constant-table branching process.

    Offspring per particle per step: 2 with p_s, 0 with p_r, 1 otherwise.
    m = 1 + p_s - p_r;  sigma^2 = 4 p_s + (1 - p_s - p_r) - m^2.
    Var[Z_N] = sigma^2 m^(N-1) (m^N - 1)/(m - 1) n0   (m != 1)
             = sigma^2 N n0                            (m == 1, critical).
    """
    p_s, p_r = split_pct / 100.0, remove_pct / 100.0
    m = 1.0 + p_s - p_r
    var1 = 4.0 * p_s + (1.0 - p_s - p_r) - m * m
    mean = n0 * m**n_steps
    if abs(m - 1.0) < 1e-12:
        var = var1 * n_steps * n0
    else:
        var = var1 * m ** (n_steps - 1) * (m**n_steps - 1.0) / (m - 1.0) * n0
    return mean, var


def _run_const(tmp_path, split_pct, remove_pct, n0, t_steps, k_steps):
    path = str(tmp_path / f"const_{split_pct}_{remove_pct}.txt")
    write_table(path, np.full((N_STEPS, 2), 0.0, np.float32)
                + np.asarray([split_pct, remove_pct], np.float32))
    # capacity/grid shared with the chi-square test below: T and the table
    # are traced, so the whole file costs ONE naive-engine compile
    cfg = SimConfig(
        init_n=n0,
        capacity=1 << 17,
        poisson_steps=k_steps,
        poisson_timestep=t_steps,
        grid_size=(32, 32, 32),
        scheduler="naive",
        cross_section_path=path,
    )
    run = run_pic(cfg, print_header=False)
    assert not any(s.overflow for s in run.steps)
    return run


@pytest.mark.parametrize(
    "split_pct,remove_pct",
    [(50.0, 50.0),   # critical (m = 1): the bundled stress table's chances
     (2.0, 1.0)],    # supercritical (m = 1.01): growth curve
)
def test_analytic_growth_const_table(tmp_path, split_pct, remove_pct):
    """The end-to-end population trajectory matches the branching-process
    mean within 4 sigma at EVERY Poisson step (BASELINE.md protocol:
    'growth curves matching within Monte-Carlo noise')."""
    n0, t_steps, k_steps = 20_000, 10, 3
    run = _run_const(tmp_path, split_pct, remove_pct, n0, t_steps, k_steps)
    if split_pct > remove_pct:
        # bookkeeping identity on the same run: n0 + added - removed ==
        # final n (the reference prints exactly these counters,
        # src/pic.cu:565-567)
        assert n0 + run.total_added - run.total_removed == run.final_n
    for s in run.steps:
        mean, var = branching_moments(
            n0, split_pct, remove_pct, (s.step + 1) * t_steps
        )
        bound = 4.0 * math.sqrt(var)
        assert abs(s.n - mean) < bound, (
            f"step {s.step}: n={s.n} vs analytic {mean:.0f} +- {bound:.0f}"
        )



def test_collision_rates_chi_square_sine(tmp_path):
    """One end-to-end mobility step against the bundled sine table: group
    particles by realized collision energy, compare realized split and
    remove counts per group to the table's stated chances (Poisson-binomial
    mean/variance), and bound the chi-square.

    Per-particle outcomes are recovered from the final state by genealogy
    id: a removed parent's id is absent; a split parent survives with its
    velocity exactly reversed (reverse-collision model,
    /root/reference/src/particle_move.cu:62-74).  The per-particle expected
    chance is table[bucket(E_post)] where E_post = |v - a dt|^2 uses the
    framework's own frozen acceleration — the prediction side is pure
    numpy + the table file.
    """
    cfg = SimConfig(
        init_n=120_000,
        capacity=1 << 17,
        poisson_steps=1,
        poisson_timestep=1,
        grid_size=(32, 32, 32),
        scheduler="naive",
        cross_section_path=bundled_paths()[0],
        init_vth=1.0e3,  # Maxwellian: energies span ~2000 table buckets
    )
    table = np.asarray(load_table(cfg.cross_section_path), np.float64)

    from particle_simulation_tpu.ops.step import grid_phase

    state0 = setup_particles(cfg)
    acc = np.asarray(grid_phase(state0, cfg).acc[: cfg.init_n], np.float64)
    v0 = np.asarray(state0.vel[: cfg.init_n], np.float64)
    ids0 = (
        np.asarray(state0.id_hi[: cfg.init_n]).astype(np.uint64) << 32
    ) | np.asarray(state0.id_lo[: cfg.init_n]).astype(np.uint64)

    run = run_pic(cfg, print_header=False)
    n_fin = int(run.state.n)
    fin_ids = (
        np.asarray(run.state.id_hi[:n_fin]).astype(np.uint64) << 32
    ) | np.asarray(run.state.id_lo[:n_fin]).astype(np.uint64)
    fin_vel = np.asarray(run.state.vel[:n_fin], np.float64)
    id_to_row = {int(i): r for r, i in enumerate(fin_ids)}

    # predicted post-push energy and table chances (f32 push replayed in
    # f64 is within a bucket-boundary sliver; boundary-straddling lanes are
    # excluded below)
    dt = cfg.mobility_dt
    v_post = v0 - acc * dt
    e_post = np.sum(v_post * v_post, axis=1)
    idx = np.trunc((np.log10(np.maximum(e_post, 1e-300)) + 6.0) * (N_STEPS / 22.0))
    idx = np.clip(idx, 0, N_STEPS - 1).astype(np.int64)
    # exclude lanes whose f32-vs-f64 energy could straddle a bucket edge
    frac = (np.log10(np.maximum(e_post, 1e-300)) + 6.0) * (N_STEPS / 22.0)
    safe = np.abs(frac - np.round(frac)) > 1e-3
    p_split = table[idx, 0] / 100.0
    p_remove = table[idx, 1] / 100.0

    # realized outcomes
    removed = np.array([int(i) not in id_to_row for i in ids0])
    split = np.zeros(len(ids0), bool)
    for k, i in enumerate(ids0):
        r = id_to_row.get(int(i))
        if r is not None:
            split[k] = bool(np.all(np.abs(fin_vel[r] + v_post[k])
                                   <= 1e-6 * np.abs(v_post[k]) + 1e-30))

    n_groups = 16
    order = np.argsort(idx)
    chi2 = 0.0
    dof = 0
    for g in range(n_groups):
        sel = order[(len(order) * g) // n_groups:
                    (len(order) * (g + 1)) // n_groups]
        sel = sel[safe[sel]]
        for p, obs in ((p_split[sel], split[sel].sum()),
                       (p_remove[sel], removed[sel].sum())):
            exp, var = p.sum(), (p * (1 - p)).sum()
            if var < 25:  # need a CLT-sized group
                continue
            chi2 += (obs - exp) ** 2 / var
            dof += 1
    assert dof >= 20, f"too few testable groups ({dof})"
    # chi2 ~ ChiSq(dof): mean dof, sd sqrt(2 dof); 4.5 sigma two-ish-sided
    assert chi2 < dof + 4.5 * math.sqrt(2 * dof), (chi2, dof)
    assert chi2 > max(dof - 4.5 * math.sqrt(2 * dof), 0.5), (chi2, dof)
