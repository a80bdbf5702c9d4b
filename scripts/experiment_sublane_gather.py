"""Feasibility: does Mosaic lower take_along_axis along SUBLANES (axis=0)
for (S, 128) tiles with arbitrary per-element sublane indices?

If yes, the cross-section lookup can do a 2-level (group, sublane, lane)
gather covering 8 chunks per visit instead of 1 — shrinking the chunk-band
sweep ~4x at the bench point (band 7-8 chunks -> 1-2 groups).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(variant, x_ref, idx_ref, o_ref):
    x = x_ref[:, :]
    idx = idx_ref[:, :]
    if variant == "sublane":
        o_ref[:, :] = jnp.take_along_axis(x, idx, axis=0)
    elif variant == "both":
        # 2D gather: row index then lane index derived from idx
        S, L = x.shape
        row = idx % S
        col = (idx * 7) % L
        g = jnp.take_along_axis(x, row, axis=0)
        o_ref[:, :] = jnp.take_along_axis(g, col, axis=1)


@functools.partial(jax.jit, static_argnames=("variant",))
def run(x, idx, variant):
    return pl.pallas_call(
        functools.partial(kernel, variant),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, idx)


def main():
    for S in (8, 32, 128):
        key = jax.random.PRNGKey(S)
        x = jax.random.normal(key, (S, 128), jnp.float32)
        idx = jax.random.randint(key, (S, 128), 0, S, jnp.int32)
        xn, idxn = np.asarray(x), np.asarray(idx)
        for variant in ("sublane", "both"):
            try:
                out = np.asarray(run(x, idx, variant))
            except Exception as e:  # noqa: BLE001
                print(f"S={S} {variant}: FAILED — {str(e)[:200]}")
                continue
            if variant == "sublane":
                want = np.take_along_axis(xn, idxn, axis=0)
            else:
                row = idxn % S
                col = (idxn * 7) % 128
                want = np.take_along_axis(
                    np.take_along_axis(xn, row, axis=0), col, axis=1
                )
            ok = np.array_equal(out, want)
            print(f"S={S} {variant}: {'OK' if ok else 'WRONG VALUES'}")


if __name__ == "__main__":
    main()
