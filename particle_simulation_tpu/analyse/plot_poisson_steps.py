"""Sim time vs Poisson step count (reference analyse/plot_poisson_steps.py)."""
import sys

from .common import DEFAULT_CSV, lineplot, load_runs

if __name__ == "__main__":
    df = load_runs(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CSV)
    lineplot(df, "iterations", "time", "func",
             "out/plots/time_vs_poisson_steps.png",
             title="Sim time vs Poisson steps")
