"""Fused Pallas push+MCC engine — the ``dynamic`` scheduler.

The reference's headline contribution is its Dynamic persistent-kernel
scheduler: keep the entire ``poisson_timestep``-long mobility phase inside
one kernel launch, with newly ionized electrons buffered in shared memory
and published to global memory via atomics+fences (src/pic.cu:19-211).  This
module is its TPU-native counterpart:

  * one ``pallas_call`` runs a particle tile through ALL T mobility steps
    while the tile lives in VMEM — HBM traffic per push drops by a factor of
    T versus the step-at-a-time XLA path (the reason the reference's Naive
    scheduler loses, SURVEY.md §3.3);
  * the cross-section table sits in VMEM as 128-wide chunks; per-step lookup
    is a chunk-swept ``tpu.dynamic_gather`` lane-LUT over only the chunk
    range the tile's energies actually occupy;
  * the shared-memory spawn buffer + lock protocol becomes a per-lane
    (depth, sublane, lane) child staging buffer written with depth-masked
    vector selects — no atomics, no fences, deterministic by construction;
  * CUDA's per-thread work stealing becomes the generation fixed-point of
    the CPU-Sync cadence (a ``lax.while_loop``), but with the whole
    generation fused into one kernel sweep; tiles outside the live range
    skip all compute.

Physics is bit-identical to the pure-JAX cadences: the kernel calls the very
same ``ops.physics.update_particles`` / ``rng.step_draws`` code on (S, 128)
tiles (tests/test_pallas.py asserts multiset equality on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import rng  # noqa: F401  (used via physics)
from ...config import SimConfig
from ...state import SimState
from ..physics import Particles, update_particles
from .. import population

LANES = 128
SUBLANES = 32          # tile = SUBLANES x LANES = 4096 particles
TILE = SUBLANES * LANES

FIELD_NAMES = (
    "px", "py", "pz", "vx", "vy", "vz", "ax", "ay", "az",
    "status", "id_hi", "id_lo",
)
_F32 = ("px", "py", "pz", "vx", "vy", "vz", "ax", "ay", "az")


def _field_dtype(name):
    if name == "status":
        return jnp.int32
    if name in ("id_hi", "id_lo"):
        return jnp.uint32
    return jnp.float32


def make_chunked_lookup(n_chunks, mode="band0"):
    """energy -> (split, remove) via chunk-swept lane-LUT.

    The (10000, 2) table is laid out as two (n_chunks, 128) arrays; bucket
    idx decomposes into (chunk, offset); each chunk lookup is one
    ``tpu.dynamic_gather`` (take_along_axis on the lane axis) over the
    chunk's values broadcast to the tile shape.  Only chunks in
    [min, max] of the tile's indices are visited — particle energies
    cluster tightly, so this is typically 1-3 chunks, not 79.
    """
    from ...cross_section import energy_to_index

    def lookup(split_ref, remove_ref, energy):
        shape = energy.shape
        idx = energy_to_index(energy)
        hi = idx // LANES
        lo = idx % LANES

        def chunk_vals(c):
            sp_chunk = jnp.broadcast_to(split_ref[c, :][None, :], shape)
            rm_chunk = jnp.broadcast_to(remove_ref[c, :][None, :], shape)
            return (
                jnp.take_along_axis(sp_chunk, lo, axis=1),
                jnp.take_along_axis(rm_chunk, lo, axis=1),
            )

        def body(c, acc):
            s, r = acc
            sel = hi == c
            spc, rmc = chunk_vals(c)
            return jnp.where(sel, spc, s), jnp.where(sel, rmc, r)

        if mode == "minmax":
            zeros = jnp.zeros(shape, jnp.float32)
            return jax.lax.fori_loop(
                jnp.min(hi), jnp.max(hi) + 1, body, (zeros, zeros)
            )

        # band0: chunk 0 (the lowest-energy band) is a persistent attractor
        # — particles in zero-field cells sit at E=0 forever — handle it
        # unconditionally and sweep only the band of *nonzero* chunks.
        sel0 = hi == 0
        sp0, rm0 = chunk_vals(0)
        sp = jnp.where(sel0, sp0, 0.0)
        rm = jnp.where(sel0, rm0, 0.0)
        hmin_nz = jnp.min(jnp.where(sel0, n_chunks - 1, hi))
        hmax_nz = jnp.max(jnp.where(sel0, 1, hi))
        return jax.lax.fori_loop(hmin_nz, hmax_nz + 1, body, (sp, rm))

    return lookup


def _mobility_kernel(
    config: SimConfig,
    n_chunks: int,
    scal_ref,          # SMEM (4,): [poisson_step, range_lo, range_hi, t_steps]
    # 12 input field refs, 2 table refs, 12 output field refs,
    # 12 child refs, 1 dropped-count ref — bound positionally below.
    *refs,
):
    n_f = len(FIELD_NAMES)
    in_refs = refs[:n_f]
    split_ref, remove_ref = refs[n_f : n_f + 2]
    out_refs = refs[n_f + 2 : 2 * n_f + 2]
    child_refs = refs[2 * n_f + 2 : 3 * n_f + 2]
    drop_ref = refs[3 * n_f + 2]

    i = pl.program_id(0)
    lo = scal_ref[1]
    hi = scal_ref[2]
    tile_lo = i * TILE
    tile_active = (tile_lo < hi) & (tile_lo + TILE > lo)

    # Single accumulated spawn-depth-drop counter, zeroed by the first tile
    # (the TPU grid is a sequential sweep on one core).
    @pl.when(i == 0)
    def _init_drop():
        drop_ref[0, 0] = 0

    @pl.when(jnp.logical_not(tile_active))
    def _passthrough():
        for r_in, r_out in zip(in_refs, out_refs):
            r_out[:, :] = r_in[:, :]

    @pl.when(tile_active)
    def _process():
        p_step = scal_ref[0].astype(jnp.uint32)
        slots = tile_lo + (
            jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (SUBLANES, LANES), 1)
        )
        in_range = (slots >= lo) & (slots < hi)
        lookup = make_chunked_lookup(n_chunks, config.lookup_mode)

        depth_iota = jax.lax.broadcasted_iota(
            jnp.int32, (config.spawn_depth, SUBLANES, LANES), 0
        )
        for r in child_refs:
            r[:, :, :] = jnp.zeros(r.shape, r.dtype)

        # Lanes in a generation pass only wake at (spawn step + 1) and a
        # tile may go fully dead mid-phase; skip whole steps when no lane
        # is active (e.g. late-spawned children tiles idle for most of the
        # phase).  min_start bounds the first step with any work.
        t_steps = scal_ref[3]
        status0 = in_refs[9][:, :]
        live0 = population.is_live(status0) & in_range
        start0 = jnp.where(
            live0, jnp.maximum(status0, 0) + 1, jnp.int32(0x7FFFFFF)
        )
        tile_first_t = jnp.min(start0)

        def step_work(t, carry):
            *fields, depth, dropped = carry
            p = Particles(**dict(zip(FIELD_NAMES, fields)))
            active = (
                population.is_live(p.status)
                & (t > jnp.maximum(p.status, 0))
                & in_range
            )
            res = update_particles(
                p,
                active=active,
                t=t,
                poisson_step=p_step,
                dt=config.mobility_dt,
                sim_size=config.sim_size,
                split_chance=None,
                remove_chance=None,
                seed=config.seed,
                table_lookup=functools.partial(lookup, split_ref, remove_ref),
            )
            store = res.spawn & (depth < config.spawn_depth)
            sel = (depth_iota == depth[None]) & store[None]
            child = res.child
            for name, r in zip(FIELD_NAMES, child_refs):
                val = getattr(child, name).astype(r.dtype)
                r[:, :, :] = jnp.where(sel, val[None], r[:, :, :])

            dropped = dropped + jnp.sum(
                (res.spawn & jnp.logical_not(store)).astype(jnp.int32)
            )
            depth = depth + store.astype(jnp.int32)
            return (*res.particles, depth, dropped)

        # Start at the tile's first step with any work (children spawned at
        # step s idle until s+1) and stop early once every in-range lane is
        # dead.  The loop body itself is branch-free straight-line vector
        # code — a per-step lax.cond measured ~15x slower.
        init = (jnp.maximum(tile_first_t, 1),) + tuple(
            r[:, :] for r in in_refs
        ) + (
            jnp.zeros((SUBLANES, LANES), jnp.int32),
            jnp.zeros((), jnp.int32),
        )

        def loop_cond(carry):
            t = carry[0]
            status = carry[10]
            return (t <= t_steps) & jnp.any(
                population.is_live(status) & in_range
            )

        def loop_body(carry):
            t = carry[0]
            out = step_work(t, carry[1:])
            return (t + 1,) + out

        if config.kernel_loop == "fori":
            final = jax.lax.fori_loop(
                1, t_steps + 1, lambda t, c: step_work(t, c), init[1:]
            )
        else:
            final = jax.lax.while_loop(loop_cond, loop_body, init)[1:]
        for r_out, val in zip(out_refs, final[: len(out_refs)]):
            r_out[:, :] = val
        drop_ref[0, 0] = drop_ref[0, 0] + final[-1]


def _pad_tables(table):
    """(10000, 2) -> two (n_chunks, 128) f32 arrays, zero padded."""
    n = table.shape[0]
    n_chunks = pl.cdiv(n, LANES)
    pad = n_chunks * LANES - n
    t = jnp.pad(table, ((0, pad), (0, 0)))
    return t[:, 0].reshape(n_chunks, LANES), t[:, 1].reshape(n_chunks, LANES), n_chunks


@functools.partial(jax.jit, static_argnames=("config", "padded_capacity"))
def _generation_pass(fields, table, scalars, config: SimConfig, padded_capacity: int):
    """One fused kernel sweep over all tiles; returns (new_fields, children,
    dropped_per_tile)."""
    split2d, remove2d, n_chunks = _pad_tables(table)
    num_tiles = padded_capacity // TILE
    rows = padded_capacity // LANES

    field_block = pl.BlockSpec(
        (SUBLANES, LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    table_block = pl.BlockSpec(
        (n_chunks, LANES), lambda i, s: (0, 0), memory_space=pltpu.VMEM
    )
    child_block = pl.BlockSpec(
        (config.spawn_depth, SUBLANES, LANES),
        lambda i, s: (0, i, 0),
        memory_space=pltpu.VMEM,
    )

    out_shapes = (
        tuple(
            jax.ShapeDtypeStruct((rows, LANES), _field_dtype(n))
            for n in FIELD_NAMES
        )
        + tuple(
            jax.ShapeDtypeStruct(
                (config.spawn_depth, rows, LANES), _field_dtype(n)
            )
            for n in FIELD_NAMES
        )
        + (jax.ShapeDtypeStruct((1, 1), jnp.int32),)
    )
    out_specs = (
        tuple(field_block for _ in FIELD_NAMES)
        + tuple(child_block for _ in FIELD_NAMES)
        + (pl.BlockSpec((1, 1), lambda i, s: (0, 0), memory_space=pltpu.SMEM),)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[*(field_block for _ in FIELD_NAMES), table_block, table_block],
        out_specs=out_specs,
    )

    kernel = functools.partial(_mobility_kernel, config, n_chunks)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={i + 1: i for i in range(len(FIELD_NAMES))},
        interpret=jax.default_backend() != "tpu",
    )(scalars, *fields, split2d, remove2d)
    n_f = len(FIELD_NAMES)
    return outs[:n_f], outs[n_f : 2 * n_f], outs[2 * n_f]


def _state_to_fields(state: SimState, padded_capacity: int):
    c = state.capacity
    pad = padded_capacity - c

    def prep(a):
        if pad:
            a = jnp.pad(a, (0, pad))
        return a.reshape(padded_capacity // LANES, LANES)

    return tuple(
        prep(x)
        for x in (
            state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
            state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
            state.acc[:, 0], state.acc[:, 1], state.acc[:, 2],
            state.status, state.id_hi, state.id_lo,
        )
    )


def _fields_to_state(state: SimState, fields) -> SimState:
    c = state.capacity
    flat = [f.reshape(-1)[:c] for f in fields]
    return state._replace(
        pos=jnp.stack(flat[0:3], axis=1),
        vel=jnp.stack(flat[3:6], axis=1),
        acc=jnp.stack(flat[6:9], axis=1),
        status=flat[9],
        id_hi=flat[10],
        id_lo=flat[11],
    )


def _append_staged(state: SimState, children, parent_lo, parent_hi) -> SimState:
    """Compact the (D, rows, LANES) staging buffers into slots [n, n+k).

    Validity = staged status > 0 AND the parent slot was in this
    generation's range (filters garbage from skipped tiles)."""
    d = children[9].shape[0]
    rows = children[9].shape[1]
    parent_slot = (
        jax.lax.broadcasted_iota(jnp.int32, (d, rows, LANES), 1) * LANES
        + jax.lax.broadcasted_iota(jnp.int32, (d, rows, LANES), 2)
    )
    valid = (
        (children[9] > 0) & (parent_slot >= parent_lo) & (parent_slot < parent_hi)
    ).reshape(-1)
    packed = jnp.stack(
        [
            jax.lax.bitcast_convert_type(c.reshape(-1), jnp.int32)
            for c in children
        ],
        axis=1,
    )
    return population.append_packed(state, valid, packed)


def mobility_phase_dynamic(
    state: SimState, poisson_step, table, config: SimConfig, t_steps
):
    """Generation fixed-point over fused kernel sweeps (fully on device)."""
    if state.pos.dtype != jnp.float32:
        raise ValueError(
            "the fused Pallas engine is f32-only; use scheduler='sync' or "
            "'naive' for f64 oracle runs"
        )
    c = state.capacity
    padded_capacity = ((c + TILE - 1) // TILE) * TILE

    def gen_cond(carry):
        st, lo, _ = carry
        return st.n_clamped > lo

    def gen_body(carry):
        st, lo, depth_overflow = carry
        hi = st.n_clamped
        scalars = jnp.stack(
            [jnp.asarray(poisson_step, jnp.int32).astype(jnp.int32), lo, hi,
             jnp.asarray(t_steps, jnp.int32)]
        )
        fields = _state_to_fields(st, padded_capacity)
        new_fields, children, dropped = _generation_pass(
            fields, table, scalars, config, padded_capacity
        )
        st = _fields_to_state(st, new_fields)
        depth_overflow = depth_overflow | (dropped[0, 0] > 0)
        st = _append_staged(st, children, lo, hi)
        return st, hi, depth_overflow

    state, _, depth_overflow = jax.lax.while_loop(
        gen_cond,
        gen_body,
        (state, jnp.zeros((), jnp.int32), jnp.zeros((), bool)),
    )
    # Spawn-depth overflow means children were lost (a particle ionized more
    # than spawn_depth times in one generation pass).  Saturate n to force
    # the runtime's capacity-overflow warning path rather than fail silently;
    # raising config.spawn_depth is the fix.
    return state._replace(
        n=jnp.where(depth_overflow, jnp.int32(state.capacity + 1), state.n)
    )
