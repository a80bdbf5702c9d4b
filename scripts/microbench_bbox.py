"""Grid-phase redesign microbench: bbox subgrid + MXU one-hot deposit.

Hypotheses to validate on the real chip (round 3, VERDICT #2):
  1. The live population stays in a tiny bounding box (init 62-cell cube,
     displacement per step is microscopic at dt=1e-12), so the field phase
     can run on a static SxSxS subgrid.
  2. XLA scatter-add cost is per-UPDATE (74M/s floor) regardless of target
     size -> shrinking the grid does NOT fix deposit; an MXU one-hot matmul
     histogram (counts = onehot_row^T @ onehot_lane, bf16 in / f32 acc,
     exact for counts < 2^24) should beat it.
  3. Random-gather cost vs table size: does a 1 MB table gather faster than
     a 67 MB one?
  4. argsort cost at bench scale (would a sort-by-cell compaction pay off?).

Run: python scripts/microbench_bbox.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:55s} {dt*1e3:9.2f} ms", flush=True)
    return dt


N = 1_310_720          # bench-point working prefix
S = 64                 # subgrid edge
C = S * S * S          # 262144 subgrid cells
R, L = C // 128, 128   # (2048, 128) layout


def main():
    key = jax.random.PRNGKey(0)
    # clustered ids: uniform over the 62^3 cube like the real init
    k1, k2 = jax.random.split(key)
    xyz = jax.random.randint(k1, (N, 3), 0, 62, jnp.int32)
    flat_sub = (xyz[:, 0] * S + xyz[:, 1]) * S + xyz[:, 2]
    # same ids embedded in the full 256^3 grid (offset 97 like the centre cube)
    G = 256
    flat_full = ((xyz[:, 0] + 97) * G + (xyz[:, 1] + 97)) * G + (xyz[:, 2] + 97)
    flat_sub, flat_full = jax.block_until_ready((flat_sub, flat_full))
    pos = (xyz.astype(jnp.float32) + 97.0) * 0.01 + 0.005

    # --- 1. bbox reduction cost -------------------------------------------
    @jax.jit
    def bbox(p):
        return jnp.min(p, axis=0), jnp.max(p, axis=0)

    timeit("bbox min/max over (N,3) f32", bbox, pos)

    # --- 2. deposits -------------------------------------------------------
    @jax.jit
    def scatter_full(f):
        z = jnp.zeros((G * G * G,), jnp.int32)
        return z.at[f].add(1)

    @jax.jit
    def scatter_sub(f):
        z = jnp.zeros((C,), jnp.int32)
        return z.at[f].add(1)

    timeit("scatter-add full 256^3 (current)", scatter_full, flat_full)
    timeit("scatter-add 64^3 subgrid", scatter_sub, flat_sub)

    # MXU one-hot histogram: counts(R, L) = sum_p onehot_row^T @ onehot_lane
    def mxu_hist(f, P):
        pad = (-f.shape[0]) % P
        fp = jnp.concatenate([f, jnp.full((pad,), -1, jnp.int32)])
        tiles = fp.reshape(-1, P)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        iota_l = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

        def body(acc, ids):
            row = (ids >> 7)[:, None]
            lane = (ids & 127)[:, None]
            oh_r = (row == iota_r).astype(jnp.bfloat16)      # (P, R)
            oh_l = (lane == iota_l).astype(jnp.bfloat16)     # (P, L)
            acc = acc + jax.lax.dot_general(
                oh_r, oh_l, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        acc0 = jnp.zeros((R, L), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, tiles)
        return acc.astype(jnp.int32).reshape(-1)

    for P in (256, 512, 1024):
        f = jax.jit(functools.partial(mxu_hist, P=P))
        out = f(flat_sub)
        ref = scatter_sub(flat_sub)
        ok = bool(jnp.all(out == ref))
        timeit(f"MXU one-hot hist P={P} (exact={ok})", f, flat_sub)

    # --- 3. gather vs table size ------------------------------------------
    table_small = jax.random.randint(k2, (C,), 0, 1 << 30, jnp.int32)
    table_big = jax.random.randint(k2, (G * G * G,), 0, 1 << 30, jnp.int32)
    table_small, table_big = jax.block_until_ready((table_small, table_big))

    @jax.jit
    def gather_small(f):
        return table_small.at[f].get(mode="promise_in_bounds")

    @jax.jit
    def gather_big(f):
        return table_big.at[f].get(mode="promise_in_bounds")

    timeit("random gather from 1 MB table", gather_small, flat_sub)
    timeit("random gather from 67 MB table", gather_big, flat_full)

    # --- 4. sort costs -----------------------------------------------------
    @jax.jit
    def argsort_1bit(f):
        return jnp.argsort((f > (C // 2)).astype(jnp.int8), stable=True)

    @jax.jit
    def argsort_cell(f):
        return jnp.argsort(f, stable=True)

    timeit("argsort 1-bit key (compaction today)", argsort_1bit, flat_sub)
    timeit("argsort 18-bit cell key", argsort_cell, flat_sub)

    # --- 5. subgrid stencil build (packed diffs) ---------------------------
    from particle_simulation_tpu.ops import grid as grid_ops

    @jax.jit
    def build_sub(ch):
        dx, dy, dz = grid_ops._int_diffs(ch, (S, S, S))
        B = grid_ops._PACK_BIAS
        return (((dx + B) << 20) | ((dy + B) << 10) | (dz + B)).reshape(-1)

    @jax.jit
    def build_full(ch):
        dx, dy, dz = grid_ops._int_diffs(ch, (G, G, G))
        B = grid_ops._PACK_BIAS
        return (((dx + B) << 20) | ((dy + B) << 10) | (dz + B)).reshape(-1)

    ch_sub = scatter_sub(flat_sub)
    ch_full = scatter_full(flat_full)
    timeit("packed-diff build 64^3", build_sub, ch_sub)
    timeit("packed-diff build 256^3 (current)", build_full, ch_full)

    # --- 6. end-to-end subgrid field phase vs current ---------------------
    packed_sub = build_sub(ch_sub)

    @jax.jit
    def gather_packed_sub(f):
        v = packed_sub.at[f].get(mode="promise_in_bounds")
        B = grid_ops._PACK_BIAS
        mask = (1 << 10) - 1
        d3 = jnp.stack(
            [(v >> 20) - B, ((v >> 10) & mask) - B, (v & mask) - B], axis=1
        )
        return d3.astype(jnp.float32)

    timeit("packed gather from 1MB subgrid", gather_packed_sub, flat_sub)


if __name__ == "__main__":
    main()
