"""Sim time vs mobility steps per scheduler (reference
analyse/plot_pic_mobility.py)."""
import sys

from .common import DEFAULT_CSV, lineplot, load_runs

if __name__ == "__main__":
    df = load_runs(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CSV)
    lineplot(df, "mobility steps", "time", "func",
             "out/plots/time_vs_mobility.png",
             title="Sim time vs mobility steps", logy=True)
