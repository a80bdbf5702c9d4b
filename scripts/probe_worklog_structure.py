"""Probe: records the raw event/band data at the bench point to quantify
the worklog engine's SLOT EFFICIENCY and lookup-band structure offline.

Runs the exact bench configuration (1M electrons, capacity 2M, T=100,
256^3 grid) on CPU via the pure-XLA naive cadence — physics is bit-identical
to the fused kernel (genealogy-keyed draws, rng.py), so the recorded spawn /
death / energy-band events are exactly what the worklog kernel sees.

Per instrumented Poisson step it saves (out/data/worklog_probe.npz):
  * spawn_bits  (T, ceil(cap/8)) u8 — packed per-step spawn masks;
  * child_hi    (T, 2) i32          — [n_before, n_after] child slot ranges;
  * death_t     (cap,) i32          — first death step per slot (0 = never);
  * stamp0      (cap,) i32          — status at phase start;
  * n0          ()                  — live count at phase start;
  * tile stats  (T, n_tiles, 6) i32 — [n_active, hmin_nz, hmax_nz,
                                       occ_mask(chunks 0..15 among active),
                                       n_idx0, n_spawn];
  * hist        (T, 96) i32         — idx histogram: 80 chunk-level bins
                                       plus bins 80..95 = fine buckets 0..15.

The offline analysis (analyse-side or ad hoc) replays the worklog pass
structure (pass-1 tiles, child start steps, D=2 suspension points) from
these events to compute executed lane-step slots vs actual pushes under
the current design and under candidate designs (coarse early exit,
start-bucketed work logs), and the per-tile-step chunk-band occupancy that
bounds what a guarded static lookup can save.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.cross_section import energy_to_index, load_table
from particle_simulation_tpu.ops import population
from particle_simulation_tpu.ops.physics import StepResult, update_particles
from particle_simulation_tpu.ops.step import (
    active_mask,
    grid_phase,
    make_table_lookup,
    poisson_loop,
    state_to_particles,
    particles_to_state,
    _step_config,
)

LANES = 128
TILE = 128 * LANES  # kernel_sublanes=128 tiles

WARM = 3
T = 100


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_stats_and_advance(state, t, poisson_index, table, death_t, cfg):
    p = state_to_particles(state)
    slot = jnp.arange(state.capacity, dtype=jnp.int32)
    active = active_mask(p.status, t) & (slot < state.n_clamped)

    # ---- stats BEFORE the step (what the kernel's T-loop sees) ----
    energy = jnp.where(active, p.vx * p.vx + p.vy * p.vy + p.vz * p.vz, 0.0)
    idx = energy_to_index(energy)
    hi = idx // LANES
    n_tiles = state.capacity // TILE
    hi_t = hi[: n_tiles * TILE].reshape(n_tiles, TILE)
    act_t = active[: n_tiles * TILE].reshape(n_tiles, TILE)
    idx_t = idx[: n_tiles * TILE].reshape(n_tiles, TILE)

    nz = act_t & (hi_t > 0)
    big = jnp.int32(10_000)
    hmin = jnp.min(jnp.where(nz, hi_t, big), axis=1)
    hmax = jnp.max(jnp.where(nz, hi_t, -1), axis=1)
    occ = jnp.zeros((n_tiles,), jnp.int32)
    for c in range(16):
        occ = occ | (
            jnp.any(act_t & (hi_t == c), axis=1).astype(jnp.int32) << c
        )
    n_active_t = jnp.sum(act_t, axis=1, dtype=jnp.int32)
    n_idx0_t = jnp.sum(act_t & (idx_t == 0), axis=1, dtype=jnp.int32)

    hist_chunk = jnp.bincount(
        jnp.where(active, hi, 95), length=96, minlength=96
    )
    hist_fine = jnp.bincount(
        jnp.where(active & (idx < 16), idx, 95), length=96
    )
    hist = jnp.where(jnp.arange(96) < 80, hist_chunk, hist_fine)

    # ---- advance (mirrors schedulers._one_step) ----
    res: StepResult = update_particles(
        p, active=active, t=t, poisson_step=poisson_index,
        dt=cfg.mobility_dt, sim_size=cfg.sim_size,
        split_chance=None, remove_chance=None, seed=cfg.seed,
        rng_rounds=cfg.rng_rounds, integrator=cfg.integrator,
        collision_model=cfg.collision_model,
        table_lookup=make_table_lookup(table),
    )
    died = active & (res.particles.status == -2) & (p.status != -2)
    death_t = jnp.where(died & (death_t == 0), t, death_t)
    n_spawn_t = jnp.sum(
        res.spawn[: n_tiles * TILE].reshape(n_tiles, TILE), axis=1,
        dtype=jnp.int32,
    )
    new_state = particles_to_state(state, res.particles)
    new_state = population.append_children(new_state, res.spawn, res.child)

    tile_stats = jnp.stack(
        [n_active_t, hmin, hmax, occ, n_idx0_t, n_spawn_t], axis=1
    )
    return new_state, death_t, res.spawn, tile_stats, hist


def main():
    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=WARM,
        poisson_timestep=T,
        grid_size=(256, 256, 256),
        scheduler="naive",
    )
    table = load_table()
    cfg = _step_config(config)

    state = setup_particles(config)
    print("warming", WARM, "poisson steps (naive, CPU) ...", flush=True)
    state, _ = poisson_loop(state, table, config, WARM, first_index=0)
    n0 = int(state.n)
    print("phase start n =", n0, flush=True)

    state = grid_phase(state, cfg)
    cap = state.capacity
    stamp0 = np.asarray(state.status)
    death_t = jnp.zeros((cap,), jnp.int32)

    spawn_bits = np.zeros((T, (cap + 7) // 8), np.uint8)
    child_ranges = np.zeros((T, 2), np.int32)
    tile_stats = np.zeros((T, cap // TILE, 6), np.int32)
    hists = np.zeros((T, 96), np.int32)

    for t in range(1, T + 1):
        n_before = int(state.n)
        state, death_t, spawn, ts, hist = step_stats_and_advance(
            state, jnp.asarray(t, jnp.int32), jnp.uint32(WARM), table,
            death_t, cfg,
        )
        spawn_bits[t - 1] = np.packbits(np.asarray(spawn))
        child_ranges[t - 1] = (n_before, int(state.n))
        tile_stats[t - 1] = np.asarray(ts)
        hists[t - 1] = np.asarray(hist)
        if t % 10 == 0:
            print(f"t={t}: n={int(state.n)}", flush=True)

    os.makedirs("out/data", exist_ok=True)
    np.savez_compressed(
        "out/data/worklog_probe.npz",
        spawn_bits=spawn_bits,
        child_ranges=child_ranges,
        death_t=np.asarray(death_t),
        stamp0=stamp0,
        n0=np.int32(n0),
        tile_stats=tile_stats,
        hist=hists,
        tile=np.int32(TILE),
    )
    print("saved out/data/worklog_probe.npz")


if __name__ == "__main__":
    main()
