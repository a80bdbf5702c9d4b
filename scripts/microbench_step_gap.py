"""Account for the poisson-step time the component anatomy doesn't explain.

Standalone pieces at the bench point: mobility ~45 ms + grid ~20 ms +
metrics glue ~2 ms = 67 ms, but the bench's best window implies ~84 ms per
step.  Bisect the gap on chip by timing, as SINGLE fused dispatches over 3
Poisson steps (the bench window shape):

  * full poisson_loop (anchor — the bench window itself)
  * grid-only loop (mobility ablated: same scan/cond/metrics skeleton)
  * mobility-only loop (grid_phase ablated; acceleration frozen — physics
    drifts from production but the engine work per step is identical)

Ablations are TIMING probes, not production paths.
Run: python scripts/microbench_step_gap.py
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
from particle_simulation_tpu.ops import population
from particle_simulation_tpu.ops.step import (
    _step_config, grid_phase, poisson_loop,
)
from particle_simulation_tpu.runtime import _bucket_size, _slice_state
from particle_simulation_tpu.schedulers import get_mobility_phase


def timeit(name, fn, *args, reps=3):
    st, _ = fn(*args)
    _ = int(st.n)
    t0 = time.perf_counter()
    for _ in range(reps):
        st, _ = fn(*args)
    _ = int(st.n)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:46s} {dt * 1e3:9.1f} ms / 3 steps "
          f"= {dt * 1e3 / 3:7.1f} ms/step", flush=True)


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
    print(f"churn-regime n = {int(state.n)}  (w = {w})", flush=True)
    scfg = _step_config(cfg)
    t_steps = jnp.asarray(cfg.poisson_timestep, jnp.int32)
    phase = get_mobility_phase(cfg.scheduler)

    def full(s, idx0):
        return poisson_loop(s, table, cfg, 3, first_index=3)

    @jax.jit
    def grid_only(s):
        def body(st, idx):
            st = grid_phase(st, scfg)
            return st, st.n

        return jax.lax.scan(body, s, jnp.arange(3, 6))

    @jax.jit
    def mobility_only(s):
        def body(st, idx):
            st, info = phase(st, idx.astype(jnp.uint32), table, scfg, t_steps)
            return st, info["pushes_lo"]

        return jax.lax.scan(body, s, jnp.arange(3, 6))

    @jax.jit
    def mobility_plus_metrics(s):
        def body(st, idx):
            n_start = st.n_clamped
            st, info = phase(st, idx.astype(jnp.uint32), table, scfg, t_steps)
            added = info["added"]
            removed = n_start + added - st.n
            return st, (info["pushes_lo"], added, removed, info["overflow"])

        return jax.lax.scan(body, s, jnp.arange(3, 6))

    timeit("full poisson_loop (anchor)", full, state, 3)
    timeit("grid-only scan", grid_only, state)
    timeit("mobility-only scan", mobility_only, state)
    timeit("mobility + metrics scan", mobility_plus_metrics, state)


if __name__ == "__main__":
    main()
