"""Final population vs mobility steps (reference
analyse/plot_pic_particles_added.py)."""
import sys

from .common import DEFAULT_CSV, lineplot, load_runs

if __name__ == "__main__":
    df = load_runs(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_CSV)
    lineplot(df, "mobility steps", "final n", "func",
             "out/plots/final_n_vs_mobility.png",
             title="Final particle count vs mobility steps", logy=True)
