"""Isolated A/B of the fused kernel's chunk-swept table lookup.

A toy Pallas kernel mimics the engine's T-loop: 100 steps over a (128,128)
tile, each step deriving an index tile and looking up (split, remove).
The real engine's band at the bench point is ~7-8 chunks, all occupied
(scripts/probe_chunks.py), so the win must come from per-visit cost.

Variants:
  a. band0 (current): broadcast_to + 2x take_along_axis + 2x where
  b. pre-broadcast scratch LUT (rows replicated once at kernel start)
  c. arithmetic accumulate (mask-multiply instead of where)
  d. 2-chunk unrolled band sweep
  e. no lookup (floor)
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L = 128, 128
T_STEPS = 100
N_CHUNKS = 79
TILES = 60


def lookup_band(split_ref, remove_ref, hi, lo, mode):
    shape = hi.shape

    def chunk_vals(c):
        sp = jnp.broadcast_to(split_ref[c, :][None, :], shape)
        rm = jnp.broadcast_to(remove_ref[c, :][None, :], shape)
        return (
            jnp.take_along_axis(sp, lo, axis=1),
            jnp.take_along_axis(rm, lo, axis=1),
        )

    if mode == "a":
        def body(c, acc):
            s, r = acc
            sel = hi == c
            spc, rmc = chunk_vals(c)
            return jnp.where(sel, spc, s), jnp.where(sel, rmc, r)
        zeros = jnp.zeros(shape, jnp.float32)
        return jax.lax.fori_loop(jnp.min(hi), jnp.max(hi) + 1, body,
                                 (zeros, zeros))
    if mode == "c":
        def body(c, acc):
            s, r = acc
            m = (hi == c).astype(jnp.float32)
            spc, rmc = chunk_vals(c)
            return s + m * spc, r + m * rmc
        zeros = jnp.zeros(shape, jnp.float32)
        return jax.lax.fori_loop(jnp.min(hi), jnp.max(hi) + 1, body,
                                 (zeros, zeros))
    if mode == "d":
        def body2(k, acc):
            s, r = acc
            c0 = 2 * k
            for dc in (0, 1):
                sel = hi == (c0 + dc)
                spc, rmc = chunk_vals(c0 + dc)
                s = jnp.where(sel, spc, s)
                r = jnp.where(sel, rmc, r)
            return s, r
        zeros = jnp.zeros(shape, jnp.float32)
        return jax.lax.fori_loop(jnp.min(hi) // 2, jnp.max(hi) // 2 + 1,
                                 body2, (zeros, zeros))
    raise ValueError(mode)


def kernel(mode, x_ref, split_ref, remove_ref, o_ref, bc_sp, bc_rm):
    if mode == "b_init":
        pass
    if mode == "b":
        @pl.when(pl.program_id(0) == 0)
        def _build():
            for c in range(N_CHUNKS):
                bc_sp[pl.ds(c * S, S), :] = jnp.broadcast_to(
                    split_ref[c, :][None, :], (S, L))
                bc_rm[pl.ds(c * S, S), :] = jnp.broadcast_to(
                    remove_ref[c, :][None, :], (S, L))

    x = x_ref[:, :]

    def step(t, carry):
        x, acc = carry
        # index tile that wanders over ~7 chunks like the real energies
        idx = (x + t * 37) % (7 * L) + 128
        hi = idx // L
        lo = idx % L
        if mode == "e":
            s = jnp.zeros((S, L), jnp.float32)
            r = s
        elif mode == "b":
            def body(c, a):
                s_, r_ = a
                sel = hi == c
                spc = jnp.take_along_axis(bc_sp[pl.ds(c * S, S), :], lo, axis=1)
                rmc = jnp.take_along_axis(bc_rm[pl.ds(c * S, S), :], lo, axis=1)
                return jnp.where(sel, spc, s_), jnp.where(sel, rmc, r_)
            zeros = jnp.zeros((S, L), jnp.float32)
            s, r = jax.lax.fori_loop(jnp.min(hi), jnp.max(hi) + 1, body,
                                     (zeros, zeros))
        else:
            s, r = lookup_band(split_ref, remove_ref, hi, lo, mode)
        return x + 1, acc + s + r

    _, acc = jax.lax.fori_loop(
        0, T_STEPS, step, (x, jnp.zeros((S, L), jnp.float32)))
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("mode",))
def run(x, split2d, remove2d, mode):
    return pl.pallas_call(
        functools.partial(kernel, mode),
        grid=(TILES,),
        in_specs=[
            pl.BlockSpec((S, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N_CHUNKS, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N_CHUNKS, L), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TILES * S, L), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((N_CHUNKS * S, L), jnp.float32),
            pltpu.VMEM((N_CHUNKS * S, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, split2d, remove2d)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (TILES * S, L), 0, 7 * L, jnp.int32)
    split2d = jax.random.uniform(key, (N_CHUNKS, L), jnp.float32)
    remove2d = jax.random.uniform(key, (N_CHUNKS, L), jnp.float32)
    x = jax.block_until_ready(x)

    ref = None
    for mode in ("a", "b", "c", "d", "e"):
        out = run(x, split2d, remove2d, mode)
        chk = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(5):
            out = run(x, split2d, remove2d, mode)
        _ = float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / 5
        if mode == "a":
            ref = chk
        ok = "" if (mode == "e" or abs(chk - ref) < 1e-3 * abs(ref)) else "  MISMATCH"
        print(f"{mode}: {dt*1e3:8.2f} ms   sum={chk:.6e}{ok}", flush=True)


if __name__ == "__main__":
    main()
