"""Step anatomy at the bench point, current (worklog) engine.

Decomposes one Poisson step at 1M live / w=1.25M bucket / 256^3 / T=100:
  * grid_phase (deposit + packed-diff field gather)
  * mobility_phase_worklog with lookup_mode = needband / band0
  * mobility with a constant-chance lookup (no table access) — lookup floor
  * mobility with rng_rounds=13 and 8 — cipher cost share

Run on the real chip: python scripts/anatomy.py
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
    from particle_simulation_tpu.ops.step import grid_phase, poisson_loop
    from particle_simulation_tpu.ops.pallas import push_mcc, worklog
    from particle_simulation_tpu.runtime import _bucket_size, _slice_state

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
    # 3 warm steps into the churn regime (same protocol as bench.py)
    state, _ = poisson_loop(state, table, cfg, 3, first_index=0)
    n0 = int(state.n)
    print(f"churn-regime n = {n0}  (w = {w})", flush=True)

    gp = jax.jit(functools.partial(grid_phase, config=cfg))

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: None, out
        )
        # force: host readback (block_until_ready no-ops on axon)
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "sum")]
        _ = float(jnp.sum(leaves[0].astype(jnp.float32))) if leaves else None
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "sum")]
        _ = float(jnp.sum(leaves[0].astype(jnp.float32))) if leaves else None
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:42s} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    timeit("grid_phase (deposit + packdiff gather)", gp, state)
    st_g = gp(state)

    zero = jnp.zeros((), jnp.int32)

    def mob(cfg_m):
        @jax.jit
        def f(s):
            out, info = worklog.mobility_phase_worklog(
                s, zero, table, cfg_m, jnp.int32(100)
            )
            return out.n, info["pushes_lo"]

        return f

    timeit("mobility worklog statichybrid",
           mob(cfg.replace(lookup_mode="statichybrid")), st_g)
    timeit("mobility worklog staticthresh",
           mob(cfg.replace(lookup_mode="staticthresh")), st_g)
    timeit("mobility worklog band0", mob(cfg.replace(lookup_mode="band0")), st_g)

    from particle_simulation_tpu import cross_section

    orig = push_mcc.make_chunked_lookup
    orig_e2i = cross_section.energy_to_index

    def const_lookup(n_chunks, mode, static_chunks=8):
        def lookup(split_ref, remove_ref, aux_ref, energy, u, bits):
            c = jnp.full(energy.shape, 0.005, jnp.float32)
            return c, c

        return lookup

    def logonly_lookup(n_chunks, mode, static_chunks=8):
        def lookup(split_ref, remove_ref, aux_ref, energy, u, bits):
            idx = orig_e2i(energy)  # real log10 bucketing, no table access
            c = idx.astype(jnp.float32) * jnp.float32(1e-12) + jnp.float32(0.005)
            return c, c

        return lookup

    def cheap_e2i(energy):
        # data-dependent but transcendental-free index in [0, 8192)
        b = jax.lax.bitcast_convert_type(jnp.asarray(energy, jnp.float32),
                                         jnp.int32)
        return (b >> 15) & 0x1FFF

    def patch(lookup_fn=None, e2i=None):
        push_mcc.make_chunked_lookup = lookup_fn or orig
        worklog.make_chunked_lookup = lookup_fn or orig
        cross_section.energy_to_index = e2i or orig_e2i

    def ctrl_lookup(n_chunks, mode, static_chunks=8):
        # dynamic-bounds fori_loop + reductions, NO gathers: control cost
        def lookup(split_ref, remove_ref, aux_ref, energy, u, bits):
            idx = orig_e2i(energy)
            hi = idx // 128
            hmin = jnp.min(jnp.where(hi > 0, hi, n_chunks - 1))
            hmax = jnp.max(jnp.where(hi > 0, hi, 1))

            def body(c, acc):
                return acc + jnp.float32(1e-12)

            base = jax.lax.fori_loop(
                hmin, hmax + 1, body, jnp.zeros(energy.shape, jnp.float32)
            )
            c = base + jnp.float32(0.005)
            return c, c

        return lookup

    def static_lookup(n_chunks, mode, static_chunks=8):
        # statically unrolled 10-chunk sweep, real gathers, NO reductions
        # or dynamic loops (timing-only: inexact beyond chunk 9)
        def lookup(split_ref, remove_ref, aux_ref, energy, u, bits):
            idx = orig_e2i(energy)
            hi = idx // 128
            lo = idx % 128
            sp = jnp.zeros(energy.shape, jnp.float32)
            rm = sp
            for c in range(10):
                sel = hi == c
                spc = jnp.take_along_axis(
                    jnp.broadcast_to(split_ref[c, :][None, :], energy.shape),
                    lo, axis=1)
                rmc = jnp.take_along_axis(
                    jnp.broadcast_to(remove_ref[c, :][None, :], energy.shape),
                    lo, axis=1)
                sp = jnp.where(sel, spc, sp)
                rm = jnp.where(sel, rmc, rm)
            return sp, rm

        return lookup

    try:
        patch(lookup_fn=const_lookup)
        timeit("mobility const-chance (floor)",
               mob(cfg.replace(lookup_mode="const")), st_g)
    finally:
        patch()


if __name__ == "__main__":
    main()
