"""Benchmark sweep harness (reference runBenchmark, src/test.cu:4-41)."""

import os

from particle_simulation_tpu.benchmarks import estimate_pushes, run_benchmark, sweep_configs
from particle_simulation_tpu.observability import CSV_HEADER


def test_sweep_config_matrix():
    full = sweep_configs("full")
    # reference: mobility steps 10..90 by 10, 100..1000 by 100 -> 19 values
    ts = sorted({c.poisson_timestep for c in full})
    assert ts[0] == 10 and ts[-1] == 1000 and len(ts) == 19
    assert {c.scheduler for c in full} == {"dynamic", "sync", "naive", "dynamic_old"}
    assert all(c.init_n == 1_000_000 and c.capacity == 50_000_000 for c in full)


def test_ci_sweep_end_to_end(tmp_path):
    out = str(tmp_path / "sweep.csv")
    runs = run_benchmark("ci", out_csv=out)
    assert runs
    lines = open(out).read().strip().split("\n")
    assert lines[0] == CSV_HEADER
    assert len(lines) == len(runs) + 1
    assert all(estimate_pushes(r) > 0 for r in runs)
