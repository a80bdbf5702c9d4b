"""Grid-phase cost split + scatter/gather variants at the bench point.

grid_phase = deposit (scatter-add histogram) + packdiff (stencil build +
one random gather).  ~32 ms total at w=1.31M/256^3; this isolates each
piece and A/Bs scatter dtypes/modes to find headroom.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp


def main():
    from particle_simulation_tpu import SimConfig, setup_particles
    from particle_simulation_tpu.cross_section import load_table
    from particle_simulation_tpu.ops import grid as grid_ops
    from particle_simulation_tpu.ops import population
    from particle_simulation_tpu.ops.step import poisson_loop
    from particle_simulation_tpu.runtime import _bucket_size, _slice_state

    config = SimConfig(
        init_n=1_000_000, capacity=2_000_000, poisson_steps=3,
        poisson_timestep=100, grid_size=(256, 256, 256), scheduler="dynamic",
    )
    table = load_table()
    state = setup_particles(config)
    w = _bucket_size(config.init_n, config.capacity)
    cfg = config.replace(capacity=w)
    state = _slice_state(state, w)
    state, _ = poisson_loop(state, table, cfg, 3, first_index=0)
    print(f"n = {int(state.n)}  w = {w}", flush=True)

    g = 256
    ncells = g * g * g
    slot = jnp.arange(w, dtype=jnp.int32)
    weight = (
        population.is_live(state.status) & (slot < state.n_clamped)
    ).astype(jnp.int32)
    idx = grid_ops.cell_indices(state.pos, cfg.cell_size, cfg.grid_size)
    flat = grid_ops.flatten_cells(idx[:, 0], idx[:, 1], idx[:, 2],
                                  cfg.grid_size)
    flat = jax.block_until_ready(flat)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(jnp.sum(out.astype(jnp.float32)).astype(jnp.float32))
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)

    @jax.jit
    def dep_i32(f, wt):
        return jnp.zeros((ncells,), jnp.int32).at[f].add(wt)

    @jax.jit
    def dep_i32_promise(f, wt):
        return jnp.zeros((ncells,), jnp.int32).at[f].add(
            wt, mode="promise_in_bounds"
        )

    @jax.jit
    def dep_f32(f, wt):
        return jnp.zeros((ncells,), jnp.float32).at[f].add(
            wt.astype(jnp.float32)
        ).astype(jnp.int32)

    @jax.jit
    def dep_u16(f, wt):
        # counts can exceed u16 only beyond 65535 particles/cell (impossible
        # here physically but not provably) — timing probe only
        return jnp.zeros((ncells,), jnp.uint16).at[f].add(
            wt.astype(jnp.uint16), mode="promise_in_bounds"
        ).astype(jnp.int32)

    timeit("deposit scatter i32 (current)", dep_i32, flat, weight)
    timeit("deposit scatter i32 promise", dep_i32_promise, flat, weight)
    timeit("deposit scatter f32", dep_f32, flat, weight)
    timeit("deposit scatter u16 promise", dep_u16, flat, weight)

    charge = dep_i32(flat, weight)
    charge = jax.block_until_ready(charge)

    @jax.jit
    def diff_build(c):
        dx, dy, dz = grid_ops._int_diffs(c, cfg.grid_size)
        return (
            ((dx + grid_ops._PACK_BIAS) << 20)
            | ((dy + grid_ops._PACK_BIAS) << 10)
            | (dz + grid_ops._PACK_BIAS)
        ).reshape(-1)

    packed = jax.block_until_ready(diff_build(charge))

    @jax.jit
    def gather_only(p, f):
        return p.at[f].get(mode="promise_in_bounds")

    @jax.jit
    def full_packdiff(c, f, wt):
        return grid_ops.gather_acceleration_packdiff(
            c, state.pos, wt, cfg.cell_size, cfg.grid_size,
            cfg.electric_force_constant,
        )

    timeit("packdiff: stencil+pack build", diff_build, charge)
    timeit("packdiff: random gather only", gather_only, packed, flat)
    timeit("packdiff: full (build+gather+unpack)", full_packdiff, charge,
           flat, weight)


if __name__ == "__main__":
    main()
