"""Sim time vs kernel tile height (sublanes) per fused engine — the TPU
analog of the reference's block-size plot (analyse/plot_pic_block.py over
the block ∈ {128,256,512,1024} axis, src/test.cu:8).  Reads the kernel-tile
sweep artifact (scripts/tile_sweep.py), whose ``block size`` column carries
``kernel_sublanes`` the same way the reference reuses that column.

    python -m particle_simulation_tpu.analyse.plot_tile [csv]
"""
import sys

from .common import lineplot, load_runs

DEFAULT_TILE_CSV = "out/data/kernel_tile_sweep.csv"

if __name__ == "__main__":
    df = load_runs(sys.argv[1] if len(sys.argv) > 1 else DEFAULT_TILE_CSV)
    # one line per (engine, T): the reference's block plot similarly holds
    # the other sweep axes fixed per line
    df = df.assign(series=df["func"] + " T=" + df["mobility steps"].astype(str))
    lineplot(df, "block size", "time", "series",
             "out/plots/time_vs_tile.png",
             title="Sim time vs kernel tile height (sublanes)", logy=True)
