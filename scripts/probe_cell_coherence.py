"""Is the production population cell-coherent enough for a banded gather?

The banded Pallas field gather (microbench_fieldgather.py) runs 5.4 ms vs
the XLA gather's 16 ms — but only if each (128,128) particle tile spans a
narrow band of packed-table rows.  This measures the REAL population's
per-tile row-band (cell id >> 7 over the 64^3 bbox window) after warm_p
Poisson steps of the production worklog engine, whose done-log retirement
order is the coherence-decay driver.

    python scripts/probe_cell_coherence.py [warm_p=3] [warm_p2=11]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.cross_section import load_table
from particle_simulation_tpu.ops import grid as g
from particle_simulation_tpu.ops import population
from particle_simulation_tpu.ops.step import poisson_loop
from particle_simulation_tpu.runtime import _bucket_size, _slice_state


def band_stats(state, cfg, label):
    S = cfg.bbox_subgrid
    slot = jnp.arange(state.capacity, dtype=jnp.int32)
    weight = (
        population.is_live(state.status) & (slot < state.n_clamped)
    ).astype(jnp.int32)
    idx = g.cell_indices(state.pos, cfg.cell_size, cfg.grid_size)
    lo, _ = g.live_bbox(idx, weight, cfg.grid_size)
    origin = jnp.maximum(lo - 1, 0)
    rel = idx - origin[None, :]
    flat = (rel[:, 0] * S + rel[:, 1]) * S + rel[:, 2]
    rows = np.asarray(jnp.where(weight > 0, flat >> 7, -1))
    tiles = rows.reshape(-1, 128 * 128)
    live = tiles >= 0
    any_live = live.any(axis=1)
    hi = np.where(live, tiles, -1).max(axis=1)[any_live]
    lo_ = np.where(live, tiles, 1 << 20).min(axis=1)[any_live]
    span = hi - lo_ + 1
    n_live = int(live.sum())
    print(f"{label}: live {n_live}  tiles {any_live.sum()}  "
          f"row-band mean {span.mean():.1f}  p90 {np.percentile(span, 90):.0f}"
          f"  max {span.max()}", flush=True)


def sort_by_cell(state, cfg):
    """One-time cell-sort of the whole state (order is physics-free:
    draws are genealogy-keyed).  Dead slots sort to the end."""
    S = cfg.bbox_subgrid
    slot = jnp.arange(state.capacity, dtype=jnp.int32)
    weight = (
        population.is_live(state.status) & (slot < state.n_clamped)
    ).astype(jnp.int32)
    idx = g.cell_indices(state.pos, cfg.cell_size, cfg.grid_size)
    lo, _ = g.live_bbox(idx, weight, cfg.grid_size)
    origin = jnp.maximum(lo - 1, 0)
    rel = idx - origin[None, :]
    flat = (rel[:, 0] * S + rel[:, 1]) * S + rel[:, 2]
    key = jnp.where(weight > 0, flat, 1 << 30)
    perm = jnp.argsort(key, stable=True)

    def take(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == state.capacity:
            return x[perm]
        return x

    return jax.tree_util.tree_map(take, state)


def main():
    p1 = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    p2 = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=p2,
        poisson_timestep=100,
        grid_size=(256, 256, 256),
        scheduler="dynamic",
    )
    table = load_table()
    state = setup_particles(config)
    w = _bucket_size(config.init_n, config.capacity)
    cfg = config.replace(capacity=w)
    state = _slice_state(state, w)
    band_stats(state, cfg, "p=0 (setup order)")
    state = sort_by_cell(state, cfg)
    band_stats(state, cfg, "p=0 SORTED")
    state, _ = poisson_loop(state, table, cfg, 1, first_index=0)
    band_stats(state, cfg, "p=1 after sort")
    state, _ = poisson_loop(state, table, cfg, p1 - 1, first_index=1)
    band_stats(state, cfg, f"p={p1} after sort")
    state, _ = poisson_loop(state, table, cfg, p2 - p1, first_index=p1)
    band_stats(state, cfg, f"p={p2} after sort")


if __name__ == "__main__":
    main()
