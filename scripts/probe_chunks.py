"""Probe: energy-chunk (table-lookup band) statistics at the bench point.

Runs the bench config's warmup (3 Poisson steps into the churn regime) on
the real chip, then reports the distribution of cross-section table chunks
(idx // 128) and the per-kernel-tile band widths that the chunk-swept VMEM
lookup actually sweeps.  Decides which lookup optimization can win.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from particle_simulation_tpu import SimConfig, setup_particles
    from particle_simulation_tpu.cross_section import load_table
    from particle_simulation_tpu.ops.step import poisson_loop

    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=3,
        poisson_timestep=100,
        grid_size=(256, 256, 256),
        scheduler="dynamic",
    )
    table = load_table()
    state = setup_particles(config)
    state, _ = poisson_loop(state, table, config, 3, first_index=0)
    n = int(state.n)
    vel = np.asarray(state.vel)[:n]
    print(f"live n = {n}")

    e = (vel * vel).sum(1)
    with np.errstate(divide="ignore"):
        idx = np.trunc((np.log10(e) + 6.0) * (10000 / 22.0))
    idx = np.clip(np.nan_to_num(idx, neginf=0.0), 0, 9999).astype(np.int32)
    hi = idx // 128
    print("chunk histogram (nonzero):")
    vals, counts = np.unique(hi, return_counts=True)
    for v, c in zip(vals, counts):
        print(f"  chunk {v:3d}: {c:9d}  ({100.0 * c / n:.3f}%)")

    # per-tile band as the kernel sees it: tiles of 128x128 = 16384 slots
    tile = 128 * 128
    pads = (-n) % tile
    hi_p = np.pad(hi, (0, pads), constant_values=0)
    tiles = hi_p.reshape(-1, tile)
    nz = np.where(tiles == 0, 78, tiles)
    nzmax = np.where(tiles == 0, 1, tiles)
    hmin = nz.min(1)
    hmax = nzmax.max(1)
    band = np.maximum(hmax - hmin + 1, 0)
    print(f"tiles={len(band)}  band min/med/mean/max = "
          f"{band.min()}/{np.median(band):.0f}/{band.mean():.1f}/{band.max()}")

    # what need-masking (u < chunkmax(split+remove)) would leave
    t = np.asarray(table)
    tot = t[:, 0] + t[:, 1]
    cmax = np.pad(tot, (0, (-len(tot)) % 128)).reshape(-1, 128).max(1)
    rng = np.random.default_rng(0)
    u = rng.uniform(0, 100, size=n)
    need = u < cmax[hi]
    print(f"need fraction = {need.mean():.4f}")
    need_p = np.pad(need, (0, pads))
    tiles_need = need_p.reshape(-1, tile)
    hm2 = np.where(tiles_need & (tiles != 0), tiles, 78).min(1)
    hx2 = np.where(tiles_need & (tiles != 0), tiles, 1).max(1)
    band2 = np.maximum(hx2 - hm2 + 1, 0)
    print(f"need-masked band med/mean/max = "
          f"{np.median(band2):.0f}/{band2.mean():.1f}/{band2.max()}")
    # chunk-occupancy sparsity within the band (skip-empty-chunk win)
    occ = []
    for trow in tiles:
        nzr = trow[trow != 0]
        occ.append(len(np.unique(nzr)))
    occ = np.array(occ)
    print(f"occupied nonzero chunks per tile med/mean/max = "
          f"{np.median(occ):.0f}/{occ.mean():.1f}/{occ.max()}")


if __name__ == "__main__":
    main()
