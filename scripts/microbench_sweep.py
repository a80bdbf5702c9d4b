"""Attribute fused-kernel sweep time: lookup vs rng vs physics.

Times one _sweep_pass at the bench shape (1M live, T=100) with:
  a. the real chunk-swept lookup (band0)
  b. a constant-chance lookup (no table access)
  c. rng_rounds=2 (cheap cipher) with real lookup
Run on the real TPU chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from particle_simulation_tpu import SimConfig, setup_particles
    from particle_simulation_tpu.cross_section import load_table
    from particle_simulation_tpu.ops.pallas import push_mcc

    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=1,
        poisson_timestep=100,
        grid_size=(256, 256, 256),
        scheduler="dynamic",
    )
    table = load_table()
    state = setup_particles(config)
    # give particles a spread of energies like the churn regime
    k = jax.random.PRNGKey(1)
    v = jax.random.normal(k, state.vel.shape, jnp.float32) * 3e5
    state = state._replace(vel=v)

    window = config.append_window or max(1 << 20, config.capacity // 4)
    window = min(window, config.capacity)
    _, tile = push_mcc._tile_dims(config)
    padded = ((config.capacity + window + tile - 1) // tile) * tile
    fields = push_mcc._state_to_fields(state, padded)
    scalars = jnp.stack([jnp.int32(0), jnp.int32(100)])

    def run(name, cfg):
        out = push_mcc._sweep_pass(fields, table, scalars, cfg, padded)
        _ = float(out[2][0])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = push_mcc._sweep_pass(fields, table, scalars, cfg, padded)
        pushes = float(out[2][0]) + float(out[2][1]) * 2**30
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:40s} {dt*1e3:9.1f} ms   pushes={pushes:.3e} "
              f"rate={pushes/dt:.3e}/s")

    run("a. band0 lookup, rounds=13", config)

    orig = push_mcc.make_chunked_lookup

    def const_lookup(n_chunks, mode="band0"):
        def lookup(split_ref, remove_ref, aux_ref, energy, u, bits):
            five = jnp.full(energy.shape, 0.05, jnp.float32)
            return five, five
        return lookup

    push_mcc.make_chunked_lookup = const_lookup
    push_mcc._sweep_pass.clear_cache()
    run("b. constant chances (no table)", config.replace(lookup_mode="const"))
    push_mcc.make_chunked_lookup = orig
    push_mcc._sweep_pass.clear_cache()

    run("c. band0 lookup, rounds=2", config.replace(rng_rounds=2))
    run("d. minmax lookup, rounds=13", config.replace(lookup_mode="minmax"))
    run("e. band0, sublanes=32", config.replace(kernel_sublanes=32))
    run("f. band0, sublanes=8", config.replace(kernel_sublanes=8))


if __name__ == "__main__":
    main()
