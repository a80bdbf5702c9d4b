"""Observability: verbose state dumps, PNG snapshots, CSV timing output.

Reference equivalents (src/utility.cu):
  * log(): copy state to host every `verbose` Poisson steps, print every
    electron, render a PNG scatter (:124-137);
  * image()/draw_particle(): libpng x/y scatter to
    out/visualization/test_%04d.png (:4-74);
  * printCSV(): timing CSV with header
    `func,init n,iterations,mobility steps,block size,sleep time,
     split chance,final n,time` (:87-106) — schema kept identical so the
    reference's analyse/ plot scripts work unchanged on our output.

PNG writing prefers the native C extension (native/fastio) and falls back to
a minimal pure-Python PNG encoder (no pillow dependency).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterable, List

import numpy as np

CSV_HEADER = (
    "func,init n,iterations,mobility steps,block size,sleep time,"
    "split chance,final n,time"
)


# --------------------------------------------------------------------------
# PNG rendering (reference utility.cu:4-74)
# --------------------------------------------------------------------------

def write_png(path: str, rgb: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as a PNG file."""
    try:
        from .utils import fastio

        fastio.write_png(path, np.ascontiguousarray(rgb, dtype=np.uint8))
        return
    except ImportError:
        pass
    h, w, _ = rgb.shape
    raw = b"".join(
        b"\x00" + rgb[row].tobytes() for row in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )
    with open(path, "wb") as f:
        f.write(png)


def render_particles(
    pos: np.ndarray, sim_size, resolution: int = 512
) -> np.ndarray:
    """x/y scatter of particles on a black background (white dots), the
    reference's visualization (draw_particle plots position.x vs position.y,
    src/utility.cu:28-43)."""
    img = np.zeros((resolution, resolution, 3), np.uint8)
    if len(pos):
        xs = np.clip(
            (pos[:, 0] / sim_size[0] * resolution).astype(np.int64), 0, resolution - 1
        )
        ys = np.clip(
            (pos[:, 1] / sim_size[1] * resolution).astype(np.int64), 0, resolution - 1
        )
        img[resolution - 1 - ys, xs] = 255
    return img


def make_log_hook(config, out_dir: str = "out/visualization", print_particles=None):
    """Returns on_step(t, state) matching the reference's log() behavior."""
    if print_particles is None:
        print_particles = config.verbose > 0 and config.init_n <= 10_000

    def on_step(t, state):
        n = int(state.n)
        pos = np.asarray(state.pos)[:n]
        print(f"Amount of particles: {n}")
        if print_particles:
            vel = np.asarray(state.vel)[:n]
            acc = np.asarray(state.acc)[:n]
            status = np.asarray(state.status)[:n]
            for i in range(n):
                print(
                    f"{i}: ({pos[i,0]:.15f}, {pos[i,1]:.15f}, {pos[i,2]:.15f}) "
                    f"({vel[i,0]:.15f}, {vel[i,1]:.15f}, {vel[i,2]:.15f}) "
                    f"(({acc[i,0]:.7f}, {acc[i,1]:.7f}, {acc[i,2]:.7f})) "
                    f"[{status[i]}]"
                )
        os.makedirs(out_dir, exist_ok=True)
        img = render_particles(pos, config.sim_size)
        write_png(os.path.join(out_dir, f"test_{t:04d}.png"), img)

    return on_step


# --------------------------------------------------------------------------
# Timing CSV (reference utility.cu:87-106)
# --------------------------------------------------------------------------

def write_timing_csv(runs: Iterable, path: str) -> None:
    """`runs` is an iterable of runtime.RunData."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    lines: List[str] = [CSV_HEADER]
    for r in runs:
        c = r.config
        # split chance column: dead field in the reference too (SURVEY.md §5.5)
        lines.append(
            f"{r.function},{c.init_n},{c.poisson_steps},{c.poisson_timestep},"
            f"{c.block_size},{c.sleep_time_ns},0,{r.final_n},{r.device_time_ms}"
        )
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
