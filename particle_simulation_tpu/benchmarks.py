"""Benchmark sweep (the reference's runBenchmark, src/test.cu:4-41).

Canonical sweep: mobility steps 10,20,..,100,200,..,1000 x schedulers, with
init_n=1e6, capacity=5e7, 10 Poisson steps; output CSV has the reference's
schema so its analyse/ scripts apply unchanged.  Block-size has no TPU
meaning, so the sweep dimension is replaced by the scheduler engines
themselves; a ``quick`` profile keeps CI runs tractable.
"""

from __future__ import annotations

import time
from typing import List

from .config import SimConfig
from .observability import write_timing_csv
from .runtime import RunData, run_pic


def sweep_configs(profile: str = "full") -> List[SimConfig]:
    if profile == "ci":
        mobility = [4, 8]
        init_n, capacity, poisson_steps = 200, 4000, 2
        grid = (16, 16, 16)
        schedulers = ["naive", "sync"]
    elif profile == "quick":
        mobility = [10, 50, 100]
        init_n, capacity, poisson_steps = 100_000, 2_000_000, 3
        grid = (128, 128, 128)
        schedulers = ["naive", "dynamic"]
    else:
        mobility = list(range(10, 100, 10)) + list(range(100, 1001, 100))
        init_n, capacity, poisson_steps = 1_000_000, 50_000_000, 10
        grid = (512, 512, 512)
        schedulers = ["dynamic", "sync", "naive", "dynamic_old"]

    configs = []
    for mob in mobility:
        for sched in schedulers:
            configs.append(
                SimConfig(
                    init_n=init_n,
                    capacity=capacity,
                    poisson_steps=poisson_steps,
                    poisson_timestep=mob,
                    scheduler=sched,
                    grid_size=grid,
                )
            )
    return configs


def run_benchmark(
    profile: str = "full", out_csv: str = "out/data/mobility_timesteps_nodet.csv"
) -> List[RunData]:
    runs: List[RunData] = []
    for cfg in sweep_configs(profile):
        t0 = time.perf_counter()
        run = run_pic(cfg, print_header=False, auto_bucket=True)
        wall = time.perf_counter() - t0
        if run.final_n >= cfg.capacity:
            print("Illegal configuration, capacity reached — skipping record")
            continue
        pushes = estimate_pushes(run)
        print(
            f"{cfg.scheduler:12s} T={cfg.poisson_timestep:5d} "
            f"final_n={run.final_n:9d} device={run.device_time_ms:9.1f} ms "
            f"wall={wall:6.1f} s pushes/s={pushes / max(run.device_time_ms / 1e3, 1e-9):.3e}"
        )
        runs.append(run)
    write_timing_csv(runs, out_csv)
    return runs


def estimate_pushes(run: RunData) -> float:
    """Total particle-pushes executed — exact, counted by the engines
    (StepMetrics.pushes)."""
    return sum(m.pushes for m in run.steps)
