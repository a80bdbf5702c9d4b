"""Shared helpers for the offline analysis scripts (reference L6,
analyse/*.py): pandas over the benchmark CSV (same schema,
observability.CSV_HEADER) + matplotlib line plots."""

from __future__ import annotations

import os

import pandas as pd

DEFAULT_CSV = "out/data/mobility_timesteps_nodet.csv"


def load_runs(path: str = DEFAULT_CSV) -> pd.DataFrame:
    df = pd.read_csv(path)
    df.columns = [c.strip() for c in df.columns]
    return df


def lineplot(df, x, y, hue, out_path, title=None, logy=False):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for key, grp in df.groupby(hue):
        grp = grp.sort_values(x)
        ax.plot(grp[x], grp[y], marker="o", label=str(key))
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    if logy:
        ax.set_yscale("log")
    if title:
        ax.set_title(title)
    ax.legend(title=hue)
    ax.grid(True, alpha=0.3)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out_path}")
