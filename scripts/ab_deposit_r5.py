"""Full-grid deposition A/B on the real chip (VERDICT r4 #7): XLA
scatter-add vs the sorted-window MXU histogram (ops/grid.deposit_sorted)
at SPREAD populations — the workload class (periodic/thermal extensions)
where the bbox window never fits.

Prints updates/s for each path at 1M/256^3 and 4M/256^3 uniform
populations, verifies count equality on-device, and times one end-to-end
Poisson step of a periodic+thermal workload under both full_deposit
modes (the perf row VERDICT asks for).

Usage: python scripts/ab_deposit_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from particle_simulation_tpu import SimConfig
from particle_simulation_tpu.cross_section import bundled_paths, load_table
from particle_simulation_tpu.ops import grid as g
from particle_simulation_tpu.ops.step import poisson_step
from particle_simulation_tpu.state import setup_particles

CELL = 0.01


def bench(name, fn, *args, reps=5):
    out = fn(*args)
    _ = int(jnp.sum(out))  # host readback forces execution (axon)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = int(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"  {name:28s} {dt * 1e3:8.2f} ms", flush=True)
    return dt, out


def main():
    grid = (256, 256, 256)
    for n in (1_000_000, 4_000_000):
        print(f"--- uniform spread, n={n:.0e}, 256^3 ---", flush=True)
        key = jax.random.PRNGKey(0)
        pos = jax.random.uniform(
            key, (n, 3), jnp.float32, 0.0, grid[0] * CELL * 0.999
        )
        weight = jnp.ones((n,), jnp.int32)
        pos = jax.device_put(pos)

        scat = jax.jit(lambda p, w: g.deposit(p, w, CELL, grid))
        sort = jax.jit(lambda p, w: g.deposit_sorted(p, w, CELL, grid))
        t_a, out_a = bench("scatter", scat, pos, weight)
        t_b, out_b = bench("sorted-window", sort, pos, weight)
        eq = bool(jnp.all(out_a == out_b))
        print(f"  equal={eq}  scatter {n / t_a / 1e6:.0f} M updates/s | "
              f"sorted {n / t_b / 1e6:.0f} M updates/s "
              f"({t_a / t_b:.2f}x)", flush=True)
        assert eq

    # end-to-end perf row: periodic + thermal workload (spread population,
    # bbox disabled), one Poisson step timed under both modes
    print("--- end-to-end periodic/thermal step (T=20, 1M, 256^3) ---",
          flush=True)
    cfg = SimConfig(
        init_n=1_000_000, capacity=2_000_000, poisson_steps=3,
        poisson_timestep=20, grid_size=grid, scheduler="dynamic",
        boundary="periodic", init_vth=1e3, bbox_subgrid=0,
        cross_section_path=bundled_paths()[0],
    )
    table = load_table(cfg.cross_section_path)
    finals = {}
    for mode in ("scatter", "sorted"):
        c = cfg.replace(full_deposit=mode)
        st = setup_particles(c)
        st, m = poisson_step(st, jnp.uint32(0), table, c)  # warm + compile
        _ = int(st.n)
        t0 = time.perf_counter()
        st, m = poisson_step(st, jnp.uint32(1), table, c)
        finals[mode] = int(st.n)
        dt = time.perf_counter() - t0
        print(f"  full_deposit={mode:8s} step2: {dt * 1e3:7.1f} ms "
              f"n={finals[mode]}", flush=True)
    assert finals["scatter"] == finals["sorted"], finals


if __name__ == "__main__":
    main()
