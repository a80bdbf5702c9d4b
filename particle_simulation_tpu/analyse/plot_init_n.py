"""Sim time vs initial particle count (reference analyse/plot_pic_init_n.py)."""
import sys

from .common import DEFAULT_CSV, lineplot, load_runs

if __name__ == "__main__":
    df = load_runs(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CSV)
    lineplot(df, "init n", "time", "func",
             "out/plots/time_vs_init_n.png",
             title="Sim time vs init n", logy=True)
