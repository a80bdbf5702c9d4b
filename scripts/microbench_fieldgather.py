"""Field-gather redesign primitives (the 14.8 ms grid-phase dominator).

microbench_grid_split.py shows the packed-diff GATHER (1.31M random reads
from the 1 MB bbox table) costs ~14.8 ms — the XLA gather floor, now the
largest single grid-phase component.  Candidate redesign: keep particles
approximately CELL-SORTED (physics is genealogy-keyed, so population order
is free) and do the gather in a Pallas kernel as a per-tile banded row
sweep like the cross-section lookup.  Primitives to price on the chip:

  1. the current XLA gather (anchor), random and sorted indices,
     with/without indices_are_sorted;
  2. stable argsort of 1.31M i32 cell ids (the re-sort cost);
  3. the (N, 12)-row packed state permutation (population.py machinery);
  4. a Pallas banded-gather kernel over sorted ids: per-(128,128)-tile
     [min,max] row band + fori row sweep (broadcast + lane LUT + select);
  5. band statistics: rows spanned per tile under sorted order.

Run: python scripts/microbench_fieldgather.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1_310_720
R, L = 2048, 128  # bbox packed table: 64^3 cells as (2048, 128) i32
SUB = 128         # kernel tile sublanes


def banded_gather_kernel(table_ref, row_ref, lane_ref, out_ref):
    rows = row_ref[:, :]
    lanes = lane_ref[:, :]
    shape = rows.shape
    hmin = jnp.min(rows)
    hmax = jnp.max(rows)

    def body(r, acc):
        line = jnp.broadcast_to(table_ref[r, :][None, :], shape)
        v = jnp.take_along_axis(line, lanes, axis=1)
        return jnp.where(rows == r, v, acc)

    out_ref[:, :] = jax.lax.fori_loop(
        hmin, hmax + 1, body, jnp.zeros(shape, jnp.int32)
    )


@jax.jit
def banded_gather(table, rows, lanes):
    grid = rows.shape[0] // SUB
    return pl.pallas_call(
        banded_gather_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((R, L), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, L), lambda i: (i, 0)),
            pl.BlockSpec((SUB, L), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((SUB, L), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(rows.shape, jnp.int32),
    )(table, rows, lanes)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    _ = int(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = int(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt * 1e3:9.2f} ms", flush=True)
    return out


def main():
    key = jax.random.PRNGKey(0)
    table = jax.random.randint(key, (R, L), 0, 1 << 30, jnp.int32)
    # clustered ids like the real population (gaussian ball in the bbox)
    k1, k2 = jax.random.split(key)
    xyz = jnp.clip(
        (32 + 10 * jax.random.normal(k1, (N, 3))).astype(jnp.int32), 0, 63
    )
    ids = (xyz[:, 0] * 64 + xyz[:, 1]) * 64 + xyz[:, 2]
    ids_sorted = jnp.sort(ids)
    flat_table = table.reshape(-1)
    _ = int(jnp.sum(ids_sorted))

    @jax.jit
    def xla_gather(f):
        return flat_table.at[f].get(mode="promise_in_bounds")

    @jax.jit
    def xla_gather_sorted_hint(f):
        return flat_table.at[f].get(
            mode="promise_in_bounds", indices_are_sorted=True
        )

    timeit("xla gather, random order (anchor)", xla_gather, ids)
    timeit("xla gather, sorted ids", xla_gather, ids_sorted)
    timeit("xla gather, sorted + hint", xla_gather_sorted_hint, ids_sorted)

    timeit("argsort 1.31M i32 (re-sort cost)",
           jax.jit(lambda f: jnp.argsort(f, stable=True)), ids)
    timeit("sort 1.31M i32", jax.jit(jnp.sort), ids)

    # (N, 12) packed row permutation — the state-reorder cost
    rows12 = jax.random.randint(k2, (N, 12), 0, 1 << 30, jnp.int32)
    perm = jnp.argsort(ids, stable=True)
    _ = int(jnp.sum(perm))
    timeit("(N,12) row permutation by perm",
           jax.jit(lambda m, p: m[p, :]), rows12, perm)

    # pallas banded gather on sorted ids
    rows = (ids_sorted >> 7).reshape(-1, L)
    lanes = (ids_sorted & 127).reshape(-1, L)
    want = np.asarray(flat_table)[np.asarray(ids_sorted)]
    out = timeit("pallas banded gather, sorted", banded_gather,
                 table, rows, lanes)
    assert np.array_equal(np.asarray(out).reshape(-1), want), "WRONG"

    rows_r = (ids >> 7).reshape(-1, L)
    lanes_r = (ids & 127).reshape(-1, L)
    timeit("pallas banded gather, RANDOM (degradation)",
           banded_gather, table, rows_r, lanes_r)

    # band stats per (128,128) tile under sorted order
    t_rows = np.asarray(rows).reshape(-1, SUB * L // L, L)  # (tiles*, SUB, L)
    t_rows = np.asarray(rows).reshape(-1, SUB, L)
    span = t_rows.max(axis=(1, 2)) - t_rows.min(axis=(1, 2)) + 1
    print(f"sorted tile row-band: mean {span.mean():.1f}  max {span.max()}",
          flush=True)


if __name__ == "__main__":
    main()
