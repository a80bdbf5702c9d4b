"""Shared helpers for the offline analysis scripts (reference L6,
analyse/*.py): pandas over the benchmark CSV (same schema,
observability.CSV_HEADER) + matplotlib line plots."""

from __future__ import annotations

import os

import pandas as pd

DEFAULT_CSV = "out/data/mobility_timesteps_nodet.csv"


def load_runs(path: str = DEFAULT_CSV) -> pd.DataFrame:
    df = pd.read_csv(path, comment="#")
    df.columns = [c.strip() for c in df.columns]
    return df


def lineplot(df, x, y, hue, out_path, title=None, logy=False):
    """Line plot with min/max error bands over repeated measurements:
    duplicate (hue, x) rows — the way the reference records repetitions —
    aggregate to the median line plus a shaded min..max band (reference
    analyse/plot.py:36 uses seaborn's errorbar band the same way)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 5))
    for key, grp in df.groupby(hue):
        agg = (
            grp.groupby(x)[y].agg(["median", "min", "max"]).reset_index()
            .sort_values(x)
        )
        line, = ax.plot(agg[x], agg["median"], marker="o", label=str(key))
        if (agg["max"] > agg["min"]).any():
            ax.fill_between(
                agg[x], agg["min"], agg["max"],
                color=line.get_color(), alpha=0.2, linewidth=0,
            )
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
