"""Prove the work-log kernel mechanisms on real TPU before building engine v2:

  1. VMEM/SMEM scratch persists across sequential grid steps;
  2. make_async_copy to a dynamic row offset of an ANY-space output works;
  3. input_output_aliases with ANY-space outputs + manual tile stores work;
  4. in-kernel one-hot lane compaction (mult+reduce) matches a JAX oracle.
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

S, L = 8, 128  # small tile for the experiment


def kernel(x_hbm, out_hbm, ptr_out, scratch, ptr_smem, sem_load, sem_store):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        ptr_smem[0] = 0

    # manual load of tile i
    pltpu.make_async_copy(x_hbm.at[pl.ds(i * S, S), :], scratch, sem_load).start()
    pltpu.make_async_copy(x_hbm.at[pl.ds(i * S, S), :], scratch, sem_load).wait()

    tile = scratch[:, :]
    valid = tile > 0

    # one-hot lane compaction: element at lane l with rank r moves to lane r
    # (cumsum is not lowerable in Mosaic -> inclusive scan as a triangular
    # matmul on the MXU; counts <= 128 are exact in f32)
    lt = (
        jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ).astype(jnp.float32)
    cnt = jnp.dot(
        valid.astype(jnp.float32), lt, preferred_element_type=jnp.float32
    ).astype(jnp.int32)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (S, L, L), 2)
    # i1 vectors cannot be reshaped to 3D in Mosaic; go through i32 ranks
    rank3 = jnp.where(valid, cnt, 0)[:, :, None]  # 0 = invalid
    onehot = (rank3 == iota_j + 1).astype(jnp.int32)
    compacted = jnp.sum(tile[:, :, None] * onehot, axis=1)

    # per-row counts -> compact nonempty rows to the front (sublane LUT)
    rowcount = cnt[:, L - 1]
    nonempty = rowcount > 0
    lt_s = (
        jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    ).astype(jnp.float32)
    rrank = jnp.dot(
        nonempty.astype(jnp.float32)[None, :], lt_s,
        preferred_element_type=jnp.float32,
    )[0].astype(jnp.int32)
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    rrank_m = jnp.where(nonempty, rrank, 0)
    row_onehot = (rrank_m[:, None] == iota_q + 1).astype(jnp.int32)
    src_row = jnp.sum(
        jax.lax.broadcasted_iota(jnp.int32, (S, S), 0) * row_onehot, axis=0
    )
    n_rows = jnp.sum(nonempty.astype(jnp.int32))
    dense = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (S, L), 0) < n_rows),
        jnp.take_along_axis(compacted, src_row[:, None] * jnp.ones((1, L), jnp.int32), axis=0),
        0,
    )

    scratch[:, :] = dense
    ptr = ptr_smem[0]
    pltpu.make_async_copy(scratch, out_hbm.at[pl.ds(ptr, S), :], sem_store).start()
    pltpu.make_async_copy(scratch, out_hbm.at[pl.ds(ptr, S), :], sem_store).wait()
    ptr_smem[0] = ptr + n_rows

    @pl.when(i == pl.num_programs(0) - 1)
    def _fin():
        ptr_out[0, 0] = ptr_smem[0]


@functools.partial(jax.jit, static_argnames=("num_tiles",))
def run(x, num_tiles):
    rows = num_tiles * S
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, L), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, L), jnp.int32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(x)


def main():
    num_tiles = 4
    rows = num_tiles * S
    rng = np.random.default_rng(0)
    x = (rng.random((rows, L)) < 0.3).astype(np.int32) * rng.integers(
        1, 1000, (rows, L)
    ).astype(np.int32)
    x = jnp.asarray(x)

    out, ptr = run(x, num_tiles)
    out, ptr = np.asarray(out), int(ptr[0, 0])

    # oracle: per source row, the valid elements left-packed; nonempty rows
    # stacked in order, tile by tile
    expect_rows = []
    for t in range(num_tiles):
        for r in range(S):
            vals = x[t * S + r][x[t * S + r] > 0]
            if len(vals):
                row = np.zeros(L, np.int32)
                row[: len(vals)] = np.asarray(vals)
                expect_rows.append(row)
    expect = np.stack(expect_rows) if expect_rows else np.zeros((0, L), np.int32)

    assert ptr == len(expect_rows), (ptr, len(expect_rows))
    np.testing.assert_array_equal(out[:ptr], expect)
    print(f"worklog mechanisms OK: {ptr} dense rows emitted, contents exact")


if __name__ == "__main__":
    main()
