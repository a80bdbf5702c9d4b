"""Headline benchmark: particle-pushes/sec/chip at 1M electrons.

Protocol (BASELINE.md north star: >= 1e9 pushes/sec/chip):
  * 1M electrons, capacity 2M, T=100 mobility steps per Poisson step,
    reference-bundled sine cross-section table, 256^3 grid;
  * one warmup Poisson step (compile + autotune), then timed steps;
  * pushes counted exactly: every particle alive during the mobility phase
    advances once per mobility step it is present for (n_start * T plus a
    half-life credit for the step's net spawns).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp

BASELINE_PUSHES_PER_SEC = 1e9  # north star (BASELINE.json)


def main():
    from particle_simulation_tpu import SimConfig, setup_particles
    from particle_simulation_tpu.cross_section import load_table
    from particle_simulation_tpu.ops.step import poisson_step

    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=4,
        poisson_timestep=100,
        grid_size=(256, 256, 256),
        scheduler="dynamic",
    )
    table = load_table()
    state = setup_particles(config)

    # warmup / compile
    state, metrics = poisson_step(state, jnp.uint32(0), table, config)
    jax.block_until_ready(state)

    pushes = 0
    t0 = time.perf_counter()
    for t in range(1, config.poisson_steps):
        n_start = int(state.n)
        state, metrics = poisson_step(state, jnp.uint32(t), table, config)
        jax.block_until_ready(state)
        added = int(metrics["added"])
        pushes += n_start * config.poisson_timestep + added * (
            config.poisson_timestep // 2
        )
    elapsed = time.perf_counter() - t0

    value = pushes / elapsed
    print(
        json.dumps(
            {
                "metric": "particle_pushes_per_sec_per_chip_at_1M",
                "value": value,
                "unit": "pushes/s",
                "vs_baseline": value / BASELINE_PUSHES_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
