"""Micro-benchmarks for append-pipeline primitives on the real TPU chip.

Measures the candidate building blocks for replacing the staged-child
argsort+gather append (VERDICT r1 'what's weak' #1):
  a. argsort over the staging domain (current cost, baseline)
  b. packed (W,12) row gather from (E,12) with monotone indices
  c. 12 separate (W,) monotone gathers from (E,)
  d. row-aligned (Q,128)-row gathers x12 from (R,128)
  e. boundary scatter-add (R -> W), cumsum/cummax over W
  f. building the packed (E,12) matrix from 12 component arrays

Timing: host readback (int(jnp.sum(...))) because block_until_ready is a
no-op on the axon backend (CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=3):
    out = fn(*args)  # compile
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:55s} {dt*1e3:9.2f} ms")
    return dt


def main():
    E = 12 * 1024 * 1024      # staging domain (D=4 x padded 3M)
    W = 1 << 20               # append window
    R = E // 128              # rows
    Q = W // 128
    key = jax.random.PRNGKey(0)

    mask = jax.random.bernoulli(key, 0.05, (E,))
    comps = [jax.random.randint(key, (E,), 0, 1 << 30, jnp.int32) for _ in range(12)]
    packed = jnp.stack(comps, axis=1)
    packed = jax.block_until_ready(packed)
    idx_w = jnp.sort(jax.random.randint(key, (W,), 0, E, jnp.int32))
    idx_q = jnp.sort(jax.random.randint(key, (Q,), 0, R, jnp.int32))
    rows128 = comps[0].reshape(R, 128)
    rowcount = jax.random.randint(key, (R,), 0, 8, jnp.int32)

    @jax.jit
    def a_argsort(m):
        return jnp.argsort(jnp.where(m, 0, 1).astype(jnp.int8), stable=True)

    @jax.jit
    def a2_argsort_small(m):
        return jnp.argsort(jnp.where(m[: E // 4], 0, 1).astype(jnp.int8), stable=True)

    @jax.jit
    def b_packed_gather(p, i):
        return p.at[i].get(indices_are_sorted=True, mode="promise_in_bounds")

    @jax.jit
    def c_separate_gathers(i, *cs):
        return sum(
            c.at[i].get(indices_are_sorted=True, mode="promise_in_bounds")
            for c in cs
        )

    @jax.jit
    def d_row_gather(r2d, i):
        return r2d.at[i].get(indices_are_sorted=True, mode="promise_in_bounds")

    @jax.jit
    def e_plan(rc):
        starts = jnp.cumsum(rc) - rc
        nonempty = rc > 0
        marker = jnp.full((W,), -1, jnp.int32)
        marker = marker.at[jnp.where(nonempty, starts, W - 1)].max(
            jnp.where(nonempty, jnp.arange(R, dtype=jnp.int32), -1),
            mode="drop",
        )
        row_of_m = jax.lax.cummax(marker)
        j = jnp.arange(W, dtype=jnp.int32) - starts[jnp.clip(row_of_m, 0, R - 1)]
        return row_of_m * 128 + j

    @jax.jit
    def f_pack(*cs):
        return jnp.stack(cs, axis=1)

    @jax.jit
    def g_lane_reduce(p2d):
        return jnp.sum((p2d > 0).astype(jnp.int32), axis=1)

    timeit("a. argsort i8 stable, E=12M", a_argsort, mask)
    timeit("a2. argsort i8 stable, E=3M", a2_argsort_small, mask)
    timeit("b. packed row gather (1M,12) <- (12M,12)", b_packed_gather, packed, idx_w)
    timeit("c. 12 separate (1M,) gathers <- (12M,)", c_separate_gathers, idx_w, *comps)
    timeit("d. one (8k,128) row gather <- (96k,128)", d_row_gather, rows128, idx_q)
    timeit("e. cumsum+boundary-scatter+cummax plan (R=96k,W=1M)", e_plan, rowcount)
    timeit("f. build packed (12M,12) from 12 comps", f_pack, *comps)
    timeit("g. lane reduce (96k,128)->(96k,)", g_lane_reduce, rows128)

    # window-size scaling of the packed gather
    for w in (1 << 17, 1 << 18, 1 << 19):
        i = jnp.sort(jax.random.randint(key, (w,), 0, E, jnp.int32))
        timeit(f"b'. packed row gather ({w>>10}k,12)", b_packed_gather, packed, i)


if __name__ == "__main__":
    main()
