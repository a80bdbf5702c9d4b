"""RNG uniformity histogram (reference analyse/analyse_random.py): draws the
per-step collision uniforms for a population and checks flatness."""
import numpy as np

from .. import rng

if __name__ == "__main__":
    ids_hi, ids_lo = rng.initial_ids(39587, np.arange(100_000))
    u = np.asarray(rng.step_uniform(39587, ids_hi, ids_lo, 0, 1, 0.0, 100.0))
    hist, edges = np.histogram(u, bins=20, range=(0, 100))
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    plt.bar(edges[:-1], hist, width=5, align="edge")
    plt.title("collision-draw uniformity (100k particles)")
    import os; os.makedirs("out/plots", exist_ok=True)
    plt.savefig("out/plots/random_hist.png", dpi=120)
    print("chi^2 flatness:", ((hist - hist.mean()) ** 2 / hist.mean()).sum())
