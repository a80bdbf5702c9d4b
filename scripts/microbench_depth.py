"""Spawn-depth A/B for the work-log engine at the bench point.

The in-kernel child staging costs NF*D vector selects per mobility step
(worklog.py step_work); smaller D trades those for extra work-log passes
(suspended parents resume next pass).  Times 3 device-resident Poisson
steps per D on the real chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp


def main():
    from particle_simulation_tpu import SimConfig, setup_particles
    from particle_simulation_tpu.cross_section import load_table
    from particle_simulation_tpu.ops.step import poisson_loop

    table = load_table()
    for d in (4, 2, 1):
        config = SimConfig(
            init_n=1_000_000,
            capacity=2_000_000,
            poisson_steps=6,
            poisson_timestep=100,
            grid_size=(256, 256, 256),
            scheduler="dynamic",
            spawn_depth=d,
        )
        state = setup_particles(config)
        state, _ = poisson_loop(state, table, config, 3, first_index=0)
        _ = int(state.n)
        t0 = time.perf_counter()
        state, metrics = poisson_loop(state, table, config, 3, first_index=3)
        _ = int(state.n)
        dt = time.perf_counter() - t0
        pushes = sum(
            int(l) + (int(h) << 30)
            for l, h in zip(metrics["pushes_lo"], metrics["pushes_hi"])
        )
        print(
            f"D={d}: {dt / 3 * 1e3:8.1f} ms/step   pushes/s={pushes / dt:.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
