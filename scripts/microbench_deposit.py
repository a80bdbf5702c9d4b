"""Deposit (charge histogram) strategy shootout on the real chip.

Candidates for particlesToGrid (src/grid_operations.cu:15-26):
  a. scatter-add (current ops/grid.py)
  b. scatter-add with pre-sorted indices
  c. sort + run-length + unique-scatter
At 1M/256^3 (bench point) and 5e7/512^3 (canonical config).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:50s} {dt*1e3:9.1f} ms")


def main():
    for n, g in ((1_000_000, 256), (50_000_000, 512)):
        ncells = g * g * g
        print(f"--- n={n:.0e} grid={g}^3 ---")
        key = jax.random.PRNGKey(0)
        flat = jax.random.randint(key, (n,), 0, ncells, jnp.int32)
        flat = jax.block_until_ready(flat)

        @jax.jit
        def a_scatter(f):
            z = jnp.zeros((ncells,), jnp.int32)
            return z.at[f].add(1)

        @jax.jit
        def b_sorted_scatter(f):
            fs = jnp.sort(f)
            z = jnp.zeros((ncells,), jnp.int32)
            return z.at[fs].add(1, indices_are_sorted=True)

        @jax.jit
        def c_sort_runs(f):
            fs = jnp.sort(f)
            boundary = jnp.concatenate(
                [jnp.ones((1,), jnp.int32), (fs[1:] != fs[:-1]).astype(jnp.int32)]
            )
            run_id = jnp.cumsum(boundary) - 1            # (n,) run index
            # run lengths via position-of-boundary trick
            pos = jnp.arange(n, dtype=jnp.int32)
            starts = jnp.where(boundary == 1, pos, n)
            starts_sorted = jnp.sort(starts)             # run starts then n's
            ends = jnp.concatenate([starts_sorted[1:], jnp.full((1,), n, jnp.int32)])
            ends = jnp.minimum(ends, n)
            run_len = ends - starts_sorted               # valid for real runs
            # per-particle own-cell count (the deposit consumer's gather shape)
            cnt = run_len[jnp.clip(run_id, 0, n - 1)]
            return cnt

        timeit("a. scatter-add", a_scatter, flat)
        timeit("b. sorted scatter-add", b_sorted_scatter, flat)
        timeit("c. sort + run machinery (no grid)", c_sort_runs, flat)


if __name__ == "__main__":
    main()
