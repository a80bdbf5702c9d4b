"""Generic exploration plot over every benchmark CSV in out/data
(reference analyse/plot.py: concat matching CSVs, grid of time-vs-steps
curves per scheduler).

    python -m particle_simulation_tpu.analyse.plot_all [prefix]

Concatenates out/data/<prefix>*.csv (default: every *.csv with the timing
schema) and writes a per-scheduler panel to out/plots/overview.png.
"""

from __future__ import annotations

import os
import sys

import pandas as pd


def load_all(prefix: str = "", data_dir: str = "out/data") -> pd.DataFrame:
    frames = []
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".csv") or not f.startswith(prefix):
            continue
        try:
            df = pd.read_csv(os.path.join(data_dir, f))
        except Exception:
            continue
        df.columns = [c.strip() for c in df.columns]
        if {"func", "mobility steps", "time"} <= set(df.columns):
            df["source"] = f
            frames.append(df)
    if not frames:
        raise SystemExit(f"no timing CSVs under {data_dir!r} (prefix={prefix!r})")
    df = pd.concat(frames, ignore_index=True).dropna(subset=["time"])
    return df


def plot(df: pd.DataFrame, out_path: str = "out/plots/overview.png"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    funcs = sorted(df["func"].unique())
    fig, axes = plt.subplots(
        1, len(funcs), figsize=(5 * len(funcs), 4), sharey=True, squeeze=False
    )
    for ax, func in zip(axes[0], funcs):
        sub = df[df["func"] == func]
        for src, grp in sub.groupby("source"):
            grp = grp.sort_values("mobility steps")
            ax.plot(grp["mobility steps"], grp["time"], marker="o",
                    label=src, alpha=0.8)
        ax.set_title(func)
        ax.set_xlabel("mobility steps")
        ax.set_yscale("log")
        ax.grid(True, alpha=0.3)
    axes[0][0].set_ylabel("time (ms, log)")
    axes[0][-1].legend(fontsize=7)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    plot(load_all(sys.argv[1] if len(sys.argv) > 1 else ""))
