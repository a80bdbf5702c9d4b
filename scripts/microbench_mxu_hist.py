"""MXU one-hot histogram variants on the real chip (grid-phase deposit).

The bbox-subgrid deposit (ops/grid.py _mxu_histogram) is dense MXU work:
n * num_cells MACs regardless of tiling (bench point: 1.31M ids over 64^3
cells = 687 GMAC).  Candidates to cut its wall time:

  * tile_p — bigger particle tiles amortize scan/one-hot overhead;
  * int8 one-hots with int32 accumulation — v5-lite int8 peak is ~2x bf16,
    and the exact int32 accumulator removes the f32 exactness-grouping
    machinery (counts < 2^31 always);
  * f32 one-hots — baseline sanity (no MXU bf16 advantage).

All variants are EXACT histograms; correctness asserted against the
current implementation.  Run on an idle chip:
    python scripts/microbench_mxu_hist.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from particle_simulation_tpu.ops.grid import _mxu_histogram


def _mxu_histogram_int8(flat, num_cells, tile_p=1024):
    """int8 one-hot / int32-accumulate variant: exact with no grouping."""
    R = num_cells // 128
    n = flat.shape[0]
    tiles = -(-n // tile_p)
    pad = tiles * tile_p - n
    fp = jnp.concatenate([flat, jnp.full((pad,), -1, jnp.int32)])
    tiled = fp.reshape(tiles, tile_p)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)

    def tile_body(acc, ids):
        row = (ids >> 7)[:, None]
        lane = (ids & 127)[:, None]
        oh_r = (row == iota_r).astype(jnp.int8)
        oh_l = (lane == iota_l).astype(jnp.int8)
        return (
            acc
            + jax.lax.dot_general(
                oh_r, oh_l, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ),
            None,
        )

    counts, _ = jax.lax.scan(
        tile_body, jnp.zeros((R, 128), jnp.int32), tiled
    )
    return counts.reshape(-1)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = int(jnp.sum(out))  # host readback (block_until_ready no-ops on axon)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = int(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    n, S = 1_310_720, 64  # bench-point bucket size, bbox window
    num_cells = S * S * S
    key = jax.random.PRNGKey(0)
    # concentration does not change one-hot matmul cost (data-independent);
    # uniform ids are representative
    flat = jax.random.randint(key, (n,), 0, num_cells, jnp.int32)
    _ = int(jnp.sum(flat))

    want = None
    for name, fn in [
        ("bf16 tile_p=1024 (current)",
         jax.jit(functools.partial(_mxu_histogram, num_cells=num_cells))),
        ("bf16 tile_p=2048",
         jax.jit(functools.partial(_mxu_histogram, num_cells=num_cells,
                                   tile_p=2048))),
        ("bf16 tile_p=4096",
         jax.jit(functools.partial(_mxu_histogram, num_cells=num_cells,
                                   tile_p=4096))),
        ("int8 tile_p=1024",
         jax.jit(functools.partial(_mxu_histogram_int8,
                                   num_cells=num_cells))),
        ("int8 tile_p=2048",
         jax.jit(functools.partial(_mxu_histogram_int8, num_cells=num_cells,
                                   tile_p=2048))),
        ("int8 tile_p=4096",
         jax.jit(functools.partial(_mxu_histogram_int8, num_cells=num_cells,
                                   tile_p=4096))),
        ("bf16 512x512 tile_p=1024 (prod lanes=512)",
         jax.jit(functools.partial(_mxu_histogram, num_cells=num_cells,
                                   lanes=512))),
        ("bf16 512x512 tile_p=2048 (prod lanes=512)",
         jax.jit(functools.partial(_mxu_histogram, num_cells=num_cells,
                                   tile_p=2048, lanes=512))),
        ("bf16 1024x256 tile_p=1024 (prod lanes=256)",
         jax.jit(functools.partial(_mxu_histogram, num_cells=num_cells,
                                   lanes=256))),
        ("bf16 256x1024 tile_p=1024 (prod lanes=1024)",
         jax.jit(functools.partial(_mxu_histogram, num_cells=num_cells,
                                   lanes=1024))),
    ]:
        try:
            out = timeit(name, fn, flat)
        except Exception as e:  # noqa: BLE001
            print(f"{name:44s} FAILED: {str(e)[:160]}", flush=True)
            continue
        if want is None:
            want = np.asarray(out)
        else:
            assert np.array_equal(np.asarray(out), want), f"{name} WRONG"
    print("all variants exact", flush=True)


if __name__ == "__main__":
    main()
