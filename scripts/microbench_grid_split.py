"""Grid-phase split at the bench point, post-r3g (deposit factorization).

Times, on the real chip after 3 warm Poisson steps (churn regime):
  * grid_phase end-to-end (deposit + stencil + gather on the bbox window)
  * the deposit histogram alone (production _mxu_histogram at config lanes)
  * the stencil+gather alone (_subgrid_packdiff_acc on fixed counts)

Run: python scripts/microbench_grid_split.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.cross_section import load_table
from particle_simulation_tpu.ops import grid as g
from particle_simulation_tpu.ops import population
from particle_simulation_tpu.ops.step import grid_phase, poisson_loop
from particle_simulation_tpu.runtime import _bucket_size, _slice_state


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaves = jax.tree_util.tree_leaves(out)
    _ = float(jnp.sum(leaves[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.2f} ms", flush=True)


def main():
    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=3,
        poisson_timestep=100,
        grid_size=(256, 256, 256),
        scheduler="dynamic",
    )
    table = load_table()
    state = setup_particles(config)
    w = _bucket_size(config.init_n, config.capacity)
    cfg = config.replace(capacity=w)
    state = _slice_state(state, w)
    state, _ = poisson_loop(state, table, cfg, 3, first_index=0)
    print(f"churn-regime n = {int(state.n)}  (w = {w}, "
          f"hist_lanes = {cfg.bbox_hist_lanes})", flush=True)

    timeit("grid_phase end-to-end",
           jax.jit(functools.partial(grid_phase, config=cfg)), state)

    S = cfg.bbox_subgrid
    slot = jnp.arange(state.capacity, dtype=jnp.int32)
    weight = (
        population.is_live(state.status) & (slot < state.n_clamped)
    ).astype(jnp.int32)

    @jax.jit
    def flat_ids(state, weight):
        idx = g.cell_indices(state.pos, cfg.cell_size, cfg.grid_size)
        lo, _ = g.live_bbox(idx, weight, cfg.grid_size)
        origin = jnp.maximum(lo - 1, 0)
        rel = idx - origin[None, :]
        flat = (rel[:, 0] * S + rel[:, 1]) * S + rel[:, 2]
        return jnp.where(weight > 0, flat, -1)

    flat = flat_ids(state, weight)
    _ = int(jnp.sum(flat))

    timeit("deposit histogram alone (config lanes)",
           jax.jit(functools.partial(
               g._mxu_histogram, num_cells=S * S * S,
               lanes=cfg.bbox_hist_lanes)), flat)

    counts = g._mxu_histogram(flat, S * S * S, lanes=cfg.bbox_hist_lanes)
    _ = int(jnp.sum(counts))

    timeit("stencil + gather alone",
           jax.jit(functools.partial(
               g._subgrid_packdiff_acc, S=S,
               e_const=cfg.electric_force_constant, weight=weight)),
           flat, counts)

    timeit("bbox reduction + flat ids alone", flat_ids, state, weight)


if __name__ == "__main__":
    main()
