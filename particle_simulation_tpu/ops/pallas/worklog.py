"""Work-log fused engine: push+MCC with in-kernel dense emission (v2).

The round-1 engine (push_mcc.py) kept the reference Dynamic scheduler's
shape — one fused kernel launch per work-list pass — but staged newly
ionized children in a sparse capacity-sized buffer that the host then
compacted with argsort+gather between passes; measured on the chip, that
host-side glue (~85 ms/pass at 1M particles) dominated the step.

This engine eliminates the glue entirely, the way the reference's Dynamic
scheduler eliminates launch overhead (src/pic.cu:19-211): the kernel itself
emits every particle record *densely* as it retires, using the TPU's
sequential grid as the serialization point (the role played by CUDA's
atomics + __threadfence publication protocol, src/pic.cu:44-50):

  * finished lanes are emitted to a **done log** — which at the end of the
    mobility phase simply IS the compacted next population (so the separate
    remove_dead_particles pass, src/pic.cu:320-357, costs nothing);
  * children and suspended parents are emitted to a **work log**; passes
    ping-pong between two logs (pass k sweeps log X fully and emits new
    work to log Y), so no buffer is ever both swept and appended;
  * emission is exact element-granular stream compaction computed inside
    the kernel: per-row ranks via a triangular MXU matmul (Mosaic has no
    cumsum), a composed lane permutation applied with one take_along_axis
    per field, and a cross-row scatter as 16-bit-split f32 MXU matmuls
    (one-hot rows make every output element the sum of exactly one value
    <= 65535, so f32 transports i32 bit patterns exactly);
  * a partial-row carry lives in VMEM scratch across grid steps and is
    re-absorbed across passes via the element count, so the done log has
    no holes and ``n`` is the exact live population;
  * dead lanes are simply not emitted;
  * counters (exact pushes as a base-2^30 i32 pair, children, overflow)
    accumulate in SMEM across the sequential grid.

Physics is bit-identical to every other cadence: the kernel calls the same
``ops.physics.update_particles`` / ``rng.step_draws`` on (S, 128) tiles,
and draws are keyed by particle genealogy, so emission order is irrelevant
(tests/test_worklog.py asserts sorted-multiset equality vs the sync
oracle, including spawn_depth=1 configs that force suspend/relocate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ... import rng
from ...config import SimConfig
from ...constants import STATUS_ALIVE
from ...cross_section import energy_to_index
from ...state import SimState
from ..physics import (
    INTEGRATORS,
    Particles,
    collision_energy,
    make_kick,
    update_particles,
)
from .. import population
from .push_mcc import (
    FIELD_NAMES,
    LANES,
    _INF_START,
    _encode_suspended,
    _field_dtype,
    _is_suspended,
    _pad_tables,
    _suspended_resume,
    _suspended_stamp,
    _tile_dims,
    chunk_bound,
    make_chunked_lookup,
    pack_poly_thresholds,
    pack_threshold_full,
    pack_threshold_table,
)

NF = len(FIELD_NAMES)
_PUSH_BASE = 1 << 30  # exact push counter: value = hi * 2^30 + lo

# smem scratch slots; slot 1 (_WORK_ELEMS) is historical — work-stream
# element counts live per segment at slots _WSEG + b (b < _WSEG_MAX)
_DONE_ELEMS, _WORK_ELEMS, _CHILDREN, _PUSH_LO, _PUSH_HI, _OVF = range(6)
_WSEG = 8
_SMEM_SLOTS = 16
_WSEG_MAX = _SMEM_SLOTS - _WSEG  # upper bound on worklog_start_buckets


def _to_typed(i32_2d, name):
    dt = _field_dtype(name)
    return i32_2d if dt == jnp.int32 else jax.lax.bitcast_convert_type(i32_2d, dt)


def _from_typed(x):
    return x if x.dtype == jnp.int32 else jax.lax.bitcast_convert_type(x, jnp.int32)


def _tri(n, strict, dtype=jnp.float32):
    """[i < j] (strict) or [i <= j] lower-triangular-transposed constant."""
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((i < j) if strict else (i <= j)).astype(dtype)


def _row_ranks(valid_i32):
    """Inclusive per-row rank of each lane among valid lanes (R, L) via a
    triangular matmul on the MXU (exact: counts <= 128 in f32)."""
    return jnp.dot(
        valid_i32.astype(jnp.float32), _tri(LANES, strict=False),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _emit_stream(
    *,
    values_i32,          # list of NF (R, L) i32 tensors (bitcast field data)
    valid,               # (R, L) bool
    elems_in,            # scalar i32: elements already in the target stream
    srclane_ref,         # (>=R, L) i32 scratch
    tl_ref,              # (>=R, L) i32 scratch
    emit_ref,            # (NF, BUF_ROWS, L) i32 scratch
    carry_ref,           # (NF, 1, L) i32 scratch (persists across tiles)
    target_ref,          # (NF, ROWS, L) i32 HBM output
    row_cap,             # static int: target rows (within the segment)
    sem,
    chunk_rows,          # static int: DMA chunk size (rows)
    q_chunks,            # static int: BUF_ROWS // chunk_rows
    row_base=0,          # static int: target segment's first row
    carry_base=0,        # static int: first carry_ref plane of this stream
):
    """Pack this tile's valid records densely after ``elems_in`` elements of
    the target stream.  Returns (new_elems, overflowed)."""
    R, L = valid.shape
    fill = elems_in % LANES
    ptr_rows = elems_in // LANES

    valid_i32 = valid.astype(jnp.int32)
    total = jnp.sum(valid_i32)

    q_of_total = (fill + total + LANES - 1) // LANES  # rows touched (incl carry)
    new_elems = elems_in + total
    rows_full = new_elems // LANES - ptr_rows         # full rows completed
    # slack: chunked DMAs may write up to chunk_rows-1 rows past rows_full
    fits = (new_elems // LANES + chunk_rows) <= row_cap
    do_emit = (total > 0) & fits

    @pl.when(do_emit)
    def _pack_and_store():
        # Ranks and row prefix live INSIDE the emit guard: a skipped call
        # (empty segment / unfit) then costs one reduction instead of two
        # MXU matmuls — with start-segmented logs most per-tile emit calls
        # are empty.
        cnt = _row_ranks(valid_i32)                   # (R, L) inclusive rank
        c_col = cnt[:, L - 1 : L]                     # (R, 1)
        # exclusive row prefix via strict triangular matmul (values <= R*L:
        # f32 exact); broadcast to 128 columns so the matmul N-dim is
        # MXU-shaped.
        c_bcast = jnp.broadcast_to(c_col, (R, LANES)).astype(jnp.float32)
        prefix = jnp.dot(
            _tri(R, strict=True).T, c_bcast, preferred_element_type=jnp.float32
        ).astype(jnp.int32)[:, 0:1]                   # (R, 1)
        start = prefix + fill                         # global pos of row's 1st elem
        o = start % LANES                             # (R, 1)
        g = start // LANES                            # (R, 1) first out row

        # composed lane target of element (r, i): (rank-1 + o_r) mod L
        # (via a scratch ref: Mosaic cannot dynamic_slice a value)
        tl_ref[0:R, :] = jnp.where(valid, (cnt - 1 + o) % LANES, -1)

        # srclane[r, l] = source lane i with tl == l (unique); 0 where none
        CH = 8
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (CH, L, L), 2)
        iota_i3 = jax.lax.broadcasted_iota(jnp.int32, (CH, L, L), 1)

        def build_chunk(k, _):
            t_chunk = tl_ref[pl.ds(k * CH, CH), :]
            oh = (t_chunk[:, :, None] == lane_j).astype(jnp.int32)
            src = jnp.sum(iota_i3 * oh, axis=1)           # (CH, L)
            srclane_ref[pl.ds(k * CH, CH), :] = src
            return 0

        jax.lax.fori_loop(0, R // CH, build_chunk, 0)
        srclane = srclane_ref[0:R, :]

        # occupied output lanes per row: [o, min(o+c, L)) + wrapped [0, o+c-L)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1)
        e = o + c_col
        low_m = (lane >= o) & (lane < jnp.minimum(e, LANES))
        high_m = lane < (e - LANES)

        # cross-row scatter: out row g_r takes the low part, g_r + 1 the
        # wrapped part.  Selection matrices are built TRANSPOSED (rows on
        # sublanes, matching g's orientation) and contracted over sublanes —
        # no vector transpose needed.  One-hot rows mean every output element
        # is a single value; the 16-bit split keeps f32 transport exact.
        iota_qT = jax.lax.broadcasted_iota(jnp.int32, (R, chunk_rows), 1)
        carry_lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
        # lane-permuted field planes are chunk-invariant — build them ONCE
        # (the chunk loop used to recompute the gather + selects per chunk)
        in_cats = []
        for f in range(NF):
            rolled = jnp.take_along_axis(values_i32[f], srclane, axis=1)
            in_cats.append(
                jax.lax.bitcast_convert_type(
                    jnp.concatenate(
                        [
                            jnp.where(low_m, rolled, 0),
                            jnp.where(high_m, rolled, 0),
                        ],
                        axis=0,
                    ),  # (2R, L)
                    jnp.uint32,
                )
            )
        for qc in range(q_chunks):
            q0 = qc * chunk_rows

            @pl.when(q_of_total > q0)
            def _chunk():
                m_low_t = (g == (iota_qT + q0)).astype(jnp.float32)     # (R, Q)
                m_high_t = ((g + 1) == (iota_qT + q0)).astype(jnp.float32)
                m_cat_t = jnp.concatenate([m_low_t, m_high_t], axis=0)  # (2R, Q)
                for f in range(NF):
                    u = in_cats[f]
                    # MXU f32 matmuls run single-pass bf16 (8 mantissa bits):
                    # transport the i32 bits as 4 exact bytes <= 255
                    dims = (((0,), (0,)), ((), ()))   # contract sublanes: M^T x IN
                    out_u = jnp.zeros(
                        (m_cat_t.shape[1], L), jnp.uint32
                    )
                    for byte in range(4):
                        b = ((u >> jnp.uint32(8 * byte)) & jnp.uint32(0xFF))
                        bf = b.astype(jnp.int32).astype(jnp.float32)
                        ob = jax.lax.dot_general(
                            m_cat_t, bf, dims, preferred_element_type=jnp.float32
                        )
                        out_u = out_u | (
                            ob.astype(jnp.int32).astype(jnp.uint32)
                            << jnp.uint32(8 * byte)
                        )
                    out = jax.lax.bitcast_convert_type(out_u, jnp.int32)
                    if qc == 0:
                        # merge the partial-row carry into out row 0
                        cr = carry_ref[carry_base + f, :, :]
                        out = jnp.concatenate(
                            [jnp.where(carry_lane < fill, cr, out[0:1]), out[1:]],
                            axis=0,
                        )
                    emit_ref[f, pl.ds(q0, chunk_rows), :] = out

        # DMA the completed full rows to the target at ptr_rows
        for qc in range(q_chunks):
            q0 = qc * chunk_rows

            @pl.when(rows_full > q0)
            def _dma():
                cp = pltpu.make_async_copy(
                    emit_ref.at[:, pl.ds(q0, chunk_rows), :],
                    target_ref.at[
                        :, pl.ds(row_base + ptr_rows + q0, chunk_rows), :
                    ],
                    sem,
                )
                cp.start()
                cp.wait()

        # new carry = the (possibly partial) row after the last full one
        for f in range(NF):
            carry_ref[carry_base + f, :, :] = emit_ref[f, pl.ds(rows_full, 1), :]

    elems_out = jnp.where(do_emit, new_elems, elems_in)
    overflowed = (total > 0) & jnp.logical_not(fits)
    return elems_out, overflowed


def _flush_carry(elems, carry_ref, target_ref, row_cap, sem,
                 row_base=0, carry_base=0):
    """Write the partial carry row (zero-padded) so the stream is complete
    in HBM.  Re-absorbed via the element count by the next pass."""
    fill = elems % LANES
    row = elems // LANES

    @pl.when((fill > 0) & (row < row_cap))
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
        for f in range(NF):
            carry_ref[carry_base + f, :, :] = jnp.where(
                lane < fill, carry_ref[carry_base + f, :, :], 0
            )
        cp = pltpu.make_async_copy(
            carry_ref.at[pl.ds(carry_base, NF)],
            target_ref.at[:, pl.ds(row_base + row, 1), :],
            sem,
        )
        cp.start()
        cp.wait()


def _worklog_kernel(
    config: SimConfig,
    n_chunks: int,
    done_rows: int,
    work_rows: int,
    n_seg: int,
    seg_rows: int,
    db_rows: int,
    wb_rows: int,
    chunk_rows: int,
    scal_ref,       # SMEM prefetch (3,): [poisson_step, t_steps, n_done_in]
    src_ref,        # (NF, S, L) i32 blocked in
    split_ref,
    remove_ref,
    aux_ref,        # lookup-mode aux table: (n_chunks, L) i32 packed
                    # thresholds (threshold) or (1, L) f32 chunk bound
                    # (needband); dummy (1, L) otherwise
    done_in,        # ANY (unused; aliased to done_out)
    work_in,        # ANY (unused; aliased to work_out)
    src_out,        # (NF, S, L) i32 blocked out (aliased to src)
    done_out,       # ANY (NF, done_rows, L) i32
    work_out,       # ANY (NF, work_rows, L) i32
    counters_out,   # SMEM (8,) i32
    stage_ref,      # (NF * D, S, L) i32 scratch
    emit_done_ref,  # (NF, db_rows, L)
    emit_work_ref,  # (NF, wb_rows, L)
    carry_done_ref,  # (NF, 1, L)
    carry_work_ref,  # (NF, 1, L)
    srclane_ref,    # (R_work, L) i32
    tl_ref,         # (R_work, L) i32
    smem,           # SMEM (_SMEM_SLOTS,) i32 running state (layout above)
    sem,
):
    S, _ = _tile_dims(config)
    D = config.spawn_depth
    i = pl.program_id(0)
    last = pl.num_programs(0) - 1

    @pl.when(i == 0)
    def _init():
        n_done = scal_ref[2]
        smem[_DONE_ELEMS] = n_done
        smem[_CHILDREN] = 0
        smem[_PUSH_LO] = 0
        smem[_PUSH_HI] = 0
        smem[_OVF] = 0
        for b in range(n_seg):
            smem[_WSEG + b] = 0
        for f in range(NF):
            carry_done_ref[f, :, :] = jnp.zeros((1, LANES), jnp.int32)
        for f in range(n_seg * NF):
            carry_work_ref[f, :, :] = jnp.zeros((1, LANES), jnp.int32)

        # re-absorb the previous pass's flushed partial done row
        @pl.when(n_done % LANES > 0)
        def _reabsorb():
            cp = pltpu.make_async_copy(
                done_out.at[:, pl.ds(n_done // LANES, 1), :],
                carry_done_ref,
                sem,
            )
            cp.start()
            cp.wait()

    # Read ALL planes BEFORE writing src_out: with input_output_aliases the
    # input and output VMEM windows may share storage, so writing the output
    # first would clobber the data (observed on hardware under jit).
    fields0 = tuple(
        _to_typed(src_ref[f, :, :], name) for f, name in enumerate(FIELD_NAMES)
    )
    status0 = fields0[FIELD_NAMES.index("status")]
    unf0 = (status0 == -1) | (status0 > 0) | _is_suspended(status0)
    tile_active = jnp.any(unf0)

    # swept lanes are all emitted (or dead): the source tile becomes EMPTY
    for f in range(NF):
        src_out[f, :, :] = jnp.zeros((S, LANES), jnp.int32)

    @pl.when(tile_active)
    def _process():
        p_step = scal_ref[0].astype(jnp.uint32)
        t_steps = scal_ref[1]
        lookup = make_chunked_lookup(
            n_chunks, config.lookup_mode, config.lookup_static_chunks,
            hits=config.lookup_hits
            and config.lookup_mode in ("threshold", "staticthresh",
                                       "staticthresh_m", "staticguard",
                                       "polythresh"),
            tail_waves=config.lookup_tail_waves,
            poly_degree=config.lookup_poly_degree,
            cand_gate=config.lookup_cand_gate,
            poly_pack=config.lookup_poly_pack
            and config.lookup_poly_degree == 2,
            margin_fold=config.lookup_margin_fold
            and config.lookup_poly_pack
            and config.lookup_poly_degree == 2,
        )

        suspended0 = _is_suspended(status0)
        stamp0 = jnp.where(suspended0, _suspended_stamp(status0), status0)
        start0 = jnp.where(
            status0 == -1,
            1,
            jnp.where(
                status0 > 0,
                status0 + 1,
                jnp.where(
                    suspended0, _suspended_resume(status0), jnp.int32(_INF_START)
                ),
            ),
        )
        tile_first_t = jnp.min(jnp.where(unf0, start0, jnp.int32(_INF_START)))

        depth_iota = jax.lax.broadcasted_iota(jnp.int32, (D, S, LANES), 0)
        # Two whole field groups never enter the per-step staging loop:
        #   * acceleration is frozen for the whole mobility phase and a
        #     child's acc equals its parent lane's — PREFILLED here;
        #   * child genealogy ids are a pure function of the lane's
        #     (loop-constant) parent id and the staged spawn step —
        #     RECONSTRUCTED once after the T-loop (below).
        # The emission's validity mask is the staged status, so non-spawn
        # lanes' prefilled/reconstructed values are never read.
        unstaged = ("ax", "ay", "az", "id_hi", "id_lo")
        for f, name in enumerate(FIELD_NAMES):
            if name in ("id_hi", "id_lo"):
                continue  # fully overwritten post-loop
            plane = (
                _from_typed(fields0[f])
                if name in ("ax", "ay", "az")
                else jnp.zeros((S, LANES), jnp.int32)
            )
            for d in range(D):
                stage_ref[f * D + d, :, :] = plane

        # Scalar-sync-free T-loop (the per-step vector->scalar reductions and
        # dynamic loop bounds cost ~4.7 us/tile-step — 3x the band sweep):
        #   * fori_loop over [first_t, t_steps] instead of a while with a
        #     per-step any() early-exit (finished tiles spin cheaply);
        #   * pushes accumulate per-LANE (reduced once after the loop);
        #   * spawn counts derive from the staging buffers after the loop;
        #   * acceleration and genealogy ids never mutate inside the phase,
        #     so they are loop constants, not carries (less VMEM spill);
        #   * pipeband: next step's lookup band is computed HERE from this
        #     step's end-of-step velocities through the exact integrator
        #     (bit-identical energies), carried as scalars, consumed next
        #     iteration — the reduce latency hides behind the step's
        #     remaining vector work.
        a0 = fields0[6:9]
        id0 = fields0[10:12]
        pipeband = config.lookup_mode == "pipeband"
        # static-unroll chunk rows broadcast ONCE before the T-loop (they
        # are loop-invariant; in-loop each visit paid S/8 vreg broadcasts)
        prep = (
            lookup.prepare_static(aux_ref, (S, LANES))
            if config.lookup_mode in ("staticguard", "staticfull",
                                       "staticfull2")
            or config.lookup_mode.startswith(("staticthresh", "polythresh"))
            else None
        )
        # the velocity-kick products a*dt/2 are loop constants too
        kick0 = make_kick(
            config.integrator, a0, config.mobility_dt, a0[0].dtype,
            b_field=config.b_field,
        )

        def next_band(p_next, may_act):
            # band over lanes that may be ACTIVE next step (inactive lanes'
            # lookups are gated off in physics, and update_particles zeroes
            # their lookup energy, so this matches the value band exactly).
            # kick0 must be passed so the band integrator is the SAME
            # expression the body runs (incl. the finite-B boris rotation).
            moved = INTEGRATORS[config.integrator](
                p_next, config.mobility_dt, kick0
            )
            hi_n = energy_to_index(collision_energy(moved)) // LANES
            nz = may_act & (hi_n > 0)
            return (
                jnp.min(jnp.where(nz, hi_n, n_chunks - 1)),
                jnp.max(jnp.where(nz, hi_n, 1)),
            )

        def one_step(t, carry, draws, live):
            # Suspension lives INSIDE the carried stamp: a lane suspended at
            # step t carries the packed work-log encoding
            # _encode_suspended(t, stamp) (<= _SUS_BASE < -1), so the single
            # ``stamp >= -1`` compare excludes DEAD and suspended lanes at
            # once — no separate susp_t carry array round-tripping VMEM
            # every iteration, and the end-of-pass emission reads the
            # already-packed status verbatim.
            # ``draws``: precomputed (u, child_hi, child_lo) for this step
            # (the unrolled pair loop's half-block); None = compute in
            # physics.  ``live``: extra scalar gate for the unrolled tail
            # (step upper+1 of a straddling pair must not execute).
            # the band scalars ride the carry only in pipeband mode
            px, py, pz, vx, vy, vz, stamp, depth, pvec, *hband = carry
            h0, h1 = hband if pipeband else (None, None)
            p = Particles(
                px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz,
                ax=a0[0], ay=a0[1], az=a0[2],
                status=stamp, id_hi=id0[0], id_lo=id0[1],
            )
            # within unf0 lanes the carried stamp is -1, >0, DEAD (-2), or
            # packed-suspended (<= _SUS_BASE): stamp >= -1 is
            # live-and-not-suspended exactly, one compare instead of three
            # (empty-slot status 0 only occurs outside unf0)
            candidate = unf0 & (stamp >= -1) & (t >= start0)
            if live is not None:
                candidate = candidate & live
            suspend_now = candidate & (depth >= D)
            active = candidate & ~suspend_now
            table_lookup = functools.partial(
                lookup, split_ref, remove_ref, aux_ref,
                **({"band": (h0, h1)} if pipeband else {}),
                **({"prep": prep} if prep is not None else {}),
            )
            # functools.partial doesn't forward attributes; re-tag the
            # protocol marker physics.update_particles dispatches on
            table_lookup.returns_hits = lookup.returns_hits
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
                rng_rounds=config.rng_rounds,
                rng_mode=config.rng_mode,
                integrator=config.integrator,
                collision_model=config.collision_model,
                table_lookup=table_lookup,
                kick=kick0,
                boundary=config.boundary,
                draws=draws,
            )
            def _stage_children():
                sel3 = (depth_iota == depth[None]) & res.spawn[None]
                child = res.child
                for f, name in enumerate(FIELD_NAMES):
                    if name in unstaged:  # prefilled/reconstructed post-loop
                        continue
                    val = _from_typed(
                        getattr(child, name).astype(_field_dtype(name))
                    )
                    for d in range(D):
                        stage_ref[f * D + d, :, :] = jnp.where(
                            sel3[d], val, stage_ref[f * D + d, :, :]
                        )

            if config.worklog_spawn_guard:
                # spawns are rare per tile-step: one scalar reduce gates the
                # 7-field x D select+store block (i32 sum — i1 reductions
                # are a Mosaic trap)
                pl.when(jnp.sum(res.spawn.astype(jnp.int32)) > 0)(
                    _stage_children
                )
            else:
                _stage_children()
            depth = depth + res.spawn.astype(jnp.int32)
            pvec = pvec + active.astype(jnp.int32)
            np_ = res.particles
            # fold the suspension into the stamp: (t - 1) << _STAMP_BITS is
            # a SCALAR (t is the loop index), so the pack costs 3 vector ops
            # on top of the select that carried susp_t before — and frees
            # one whole (S, L) loop carry
            stamp_next = jnp.where(
                suspend_now, _encode_suspended(t, np_.status), np_.status
            )
            base = (
                np_.px, np_.py, np_.pz, np_.vx, np_.vy, np_.vz,
                stamp_next, depth, pvec,
            )
            if pipeband:
                may_act = unf0 & population.is_live(stamp_next)
                h0, h1 = next_band(np_, may_act)
                return base + (h0, h1)
            return base

        zeros = jnp.zeros((S, LANES), jnp.int32)
        p_init = Particles(
            px=fields0[0], py=fields0[1], pz=fields0[2],
            vx=fields0[3], vy=fields0[4], vz=fields0[5],
            ax=a0[0], ay=a0[1], az=a0[2],
            status=stamp0, id_hi=id0[0], id_lo=id0[1],
        )
        init = (
            *fields0[0:6],
            stamp0,
            zeros,                     # depth
            zeros,                     # per-lane push counts
        )
        if pipeband:
            # band for the first executed step: the integrator applied to
            # the initial state (body computes step t+1's band from step
            # t's output)
            init = init + next_band(p_init, unf0 & population.is_live(stamp0))

        t0 = jnp.maximum(tile_first_t, 1)
        hz = config.worklog_horizon
        if hz:
            # horizon sweep: advance at most hz steps from this tile's own
            # t0 (or to the end of t0's width-hz window when aligned, so
            # resumes cluster at window boundaries).  Bounds post-death
            # idle slots at hz-1; probe_horizon.py picked the default.
            if config.worklog_align:
                upper = jnp.where(
                    t0 < 2,
                    jnp.int32(1),
                    ((t0 - 2) // hz + 1) * hz + 1,
                )
                upper = jnp.minimum(upper, t_steps)
            else:
                upper = jnp.minimum(t0 + hz - 1, t_steps)
        else:
            upper = t_steps
        if config.worklog_unroll in (2, 4, 8):
            # worklog_unroll mobility steps per fori_loop iteration: the
            # loop carries round-trip VMEM once per ITERATION (the measured
            # dominant spill cost, DESIGN.md), so per-step carry traffic
            # divides by the unroll; and under rng_mode="block2" ONE pair
            # block (rng.pair_draws) replaces two per-step ciphers.  Pair
            # bases are GLOBALLY aligned (t even) so draws are identical
            # across pass/resume/unroll boundaries; the half-steps outside
            # [t0, upper] run fully masked (entry: t0-1 < every start0;
            # exit: the `live` gates — at unroll=4 the second pair's even
            # step may itself straddle upper, hence its own gate).
            U = config.worklog_unroll
            e0 = (t0 // 2) * 2
            n_iters = jnp.maximum((upper - e0) // U + 1, 0)
            use_pair = config.rng_mode == "block2"

            def unrolled_body(k, carry):
                base = e0 + U * k
                for half in range(0, U, 2):
                    tb = base + half
                    if use_pair:
                        d_even, d_odd = rng.pair_draws(
                            config.seed, id0[0], id0[1], p_step,
                            tb.astype(jnp.uint32), 0.0, 100.0,
                            rounds=config.rng_rounds,
                        )
                    else:
                        d_even = d_odd = None
                    carry = one_step(
                        tb, carry, d_even,
                        None if half == 0 else tb <= upper,
                    )
                    carry = one_step(tb + 1, carry, d_odd, (tb + 1) <= upper)
                return carry

            final = jax.lax.fori_loop(0, n_iters, unrolled_body, init)
        else:
            final = jax.lax.fori_loop(
                t0, upper + 1, lambda t, c: one_step(t, c, None, None), init
            )
        (px, py, pz, vx, vy, vz, stamp, depth, pvec, *_hb) = final
        if hz:
            # mid-phase window end: still-live lanes re-emit as suspended
            # work.  Lanes that executed resume at upper+1; lanes whose
            # start lies beyond the window keep their own start (the
            # re-encode reconstructs their packing bit-identically).
            live_mid = population.is_live(stamp) & (upper < t_steps)
            stamp = jnp.where(
                live_mid,
                _encode_suspended(jnp.maximum(start0, upper + 1), stamp),
                stamp,
            )
        fields = (px, py, pz, vx, vy, vz, *a0, stamp, *id0)
        tile_pushes = jnp.sum(pvec, dtype=jnp.int32)
        tile_spawns = jnp.zeros((), jnp.int32)
        for d in range(D):
            tile_spawns = tile_spawns + jnp.sum(
                (stage_ref[9 * D + d, :, :] > 0).astype(jnp.int32)
            )

        # Reconstruct the child id stage planes from (parent id, staged
        # spawn step): rng.child_ids_at replays the same draw protocol
        # physics used at the spawn step, so the values are bit-identical to
        # what per-step staging produced — at the cost of D cipher
        # evaluations per tile instead of 2 fields x D (S, L) select+RMWs
        # per T-step.
        f_hi, f_lo = FIELD_NAMES.index("id_hi"), FIELD_NAMES.index("id_lo")
        for d in range(D):
            t_d = stage_ref[9 * D + d, :, :]
            c_hi, c_lo = rng.child_ids_at(
                config.rng_mode, config.seed, id0[0], id0[1], p_step,
                t_d.astype(jnp.uint32), rounds=config.rng_rounds,
            )
            stage_ref[f_hi * D + d, :, :] = _from_typed(c_hi)
            stage_ref[f_lo * D + d, :, :] = _from_typed(c_lo)

        # suspension is folded into the stamp (packed <= _SUS_BASE), so
        # is_live already excludes suspended lanes
        live_end = population.is_live(stamp)
        finished = unf0 & live_end
        suspended = unf0 & _is_suspended(stamp)

        # ---- done stream: finished lanes, status reset to ALIVE ----
        done_vals = []
        for f, name in enumerate(FIELD_NAMES):
            v = _from_typed(fields[f])
            if name == "status":
                v = jnp.where(finished, jnp.int32(STATUS_ALIVE), 0)
            done_vals.append(jnp.where(finished, v, 0))
        d_elems, d_ovf = _emit_stream(
            values_i32=done_vals,
            valid=finished,
            elems_in=smem[_DONE_ELEMS],
            srclane_ref=srclane_ref,
            tl_ref=tl_ref,
            emit_ref=emit_done_ref,
            carry_ref=carry_done_ref,
            target_ref=done_out,
            row_cap=done_rows,
            sem=sem,
            chunk_rows=chunk_rows,
            q_chunks=db_rows // chunk_rows,
        )
        smem[_DONE_ELEMS] = d_elems

        # ---- work stream: suspended parents + staged children ----
        # With n_seg > 1 the work log is partitioned into start-step
        # segments: records route to segment b by the step they will first
        # execute (child stamp + 1, or the packed resume step).  Work-log
        # tiles then hold start-homogeneous lanes, so the next pass's
        # T-loop (which runs [min start in tile, T]) stops burning slots on
        # lanes that only wake near the end of the phase — the probe
        # (scripts/analyse_probe_structure.py) measured slot efficiency
        # 0.341 with one mixed log vs 0.418 with 4 segments at the bench
        # point.  Emission order within a segment is unchanged, and
        # routing cannot change physics (draws are genealogy-keyed;
        # tests/test_worklog.py asserts multiset equality).
        work_vals = []
        for f, name in enumerate(FIELD_NAMES):
            # the stamp field already carries the packed suspended encoding
            v = _from_typed(fields[f])
            plane0 = jnp.where(suspended, v, 0)
            planes = [plane0] + [stage_ref[f * D + d, :, :] for d in range(D)]
            work_vals.append(jnp.concatenate(planes, axis=0))
        w_status = work_vals[FIELD_NAMES.index("status")]
        w_valid = w_status != 0
        if n_seg == 1:
            b_idx = None
        else:
            w_start = jnp.where(
                _is_suspended(w_status),
                _suspended_resume(w_status),
                w_status + 1,
            )
            if config.worklog_horizon:
                # modular windows of width hz: within-segment start spread
                # stays <= hz at ANY t_steps (a horizon pass's emissions
                # span ~2 adjacent windows, so wrap reuse rarely collides)
                b_idx = (
                    jnp.maximum(w_start - 2, 0) // config.worklog_horizon
                ) % n_seg
            else:
                # starts span [2, t_steps + 1] -> linear map onto segments
                b_idx = jnp.clip(
                    ((w_start - 2) * n_seg) // jnp.maximum(t_steps, 1),
                    0,
                    n_seg - 1,
                )
        w_ovf = jnp.zeros((), jnp.bool_)
        for b in range(n_seg):
            valid_b = w_valid if b_idx is None else (w_valid & (b_idx == b))
            e_b, o_b = _emit_stream(
                values_i32=work_vals,
                valid=valid_b,
                elems_in=smem[_WSEG + b],
                srclane_ref=srclane_ref,
                tl_ref=tl_ref,
                emit_ref=emit_work_ref,
                carry_ref=carry_work_ref,
                target_ref=work_out,
                row_cap=seg_rows,
                sem=sem,
                chunk_rows=chunk_rows,
                q_chunks=wb_rows // chunk_rows,
                row_base=b * seg_rows,
                carry_base=b * NF,
            )
            smem[_WSEG + b] = e_b
            w_ovf = w_ovf | o_b

        smem[_CHILDREN] = smem[_CHILDREN] + tile_spawns
        lo = smem[_PUSH_LO] + tile_pushes
        smem[_PUSH_LO] = lo & (_PUSH_BASE - 1)
        smem[_PUSH_HI] = smem[_PUSH_HI] + (lo >> 30)
        smem[_OVF] = smem[_OVF] | d_ovf.astype(jnp.int32) | w_ovf.astype(jnp.int32)

    @pl.when(i == last)
    def _finalize():
        _flush_carry(smem[_DONE_ELEMS], carry_done_ref, done_out, done_rows, sem)
        w_total = jnp.zeros((), jnp.int32)
        for b in range(n_seg):
            _flush_carry(
                smem[_WSEG + b], carry_work_ref, work_out, seg_rows, sem,
                row_base=b * seg_rows, carry_base=b * NF,
            )
            w_total = w_total + smem[_WSEG + b]
        counters_out[0] = smem[_DONE_ELEMS]
        counters_out[1] = w_total
        counters_out[2] = smem[_CHILDREN]
        counters_out[3] = smem[_PUSH_LO]
        counters_out[4] = smem[_PUSH_HI]
        counters_out[5] = smem[_OVF]
        counters_out[6] = 0
        counters_out[7] = 0


def _sweep(src, done, work, table, scalars, config: SimConfig):
    """One work-list pass: sweep every tile of ``src``; finished records
    append to ``done``, new work (children + suspended) appends to ``work``.

    src/done/work are (NF, rows, 128) i32 stacks; returns
    (src_zeroed, done, work, counters)."""
    S, TILE = _tile_dims(config)
    D = config.spawn_depth
    split2d, remove2d, n_chunks = _pad_tables(table)
    if config.lookup_mode in ("staticfull", "staticfull2"):
        aux = pack_threshold_full(table)           # (2 x 8-padded chunks, L) i32
    elif config.lookup_mode.startswith("polythresh"):
        aux = pack_poly_thresholds(
            table, config.lookup_poly_degree,
            pack_bf16=config.lookup_poly_pack
            and config.lookup_poly_degree == 2,
            fold_margin=config.lookup_margin_fold
            and config.lookup_poly_pack
            and config.lookup_poly_degree == 2,
            err_cap=config.lookup_poly_err_cap,
            fit=config.lookup_poly_fit,
        )                                          # (8-padded degree+3, L) i32
    elif config.lookup_mode in ("threshold", "staticguard") or (
        config.lookup_mode.startswith("staticthresh")
    ):
        aux = pack_threshold_table(table)          # (8-padded chunks, L) i32
    elif config.lookup_mode == "needband":
        aux = chunk_bound(table)                   # (1, L) f32
    else:
        aux = jnp.zeros((1, LANES), jnp.float32)   # unused
    src_rows = src.shape[1]
    done_rows = done.shape[1]
    work_rows = work.shape[1]
    n_seg = max(1, config.worklog_start_buckets)
    seg_rows = work_rows // n_seg
    num_tiles = src_rows // S
    R_work = (D + 1) * S
    chunk_rows = min(128, S)
    db_rows = ((S + 2 + chunk_rows - 1) // chunk_rows + 1) * chunk_rows
    wb_rows = ((R_work + 2 + chunk_rows - 1) // chunk_rows + 1) * chunk_rows

    field_block = pl.BlockSpec(
        (NF, S, LANES), lambda i, s: (0, i, 0), memory_space=pltpu.VMEM
    )
    table_block = pl.BlockSpec(
        (n_chunks, LANES), lambda i, s: (0, 0), memory_space=pltpu.VMEM
    )
    aux_block = pl.BlockSpec(
        aux.shape, lambda i, s: (0, 0), memory_space=pltpu.VMEM
    )
    any_spec = pl.BlockSpec(memory_space=pl.ANY)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[field_block, table_block, table_block, aux_block,
                  any_spec, any_spec],
        out_specs=(
            field_block,
            any_spec,
            any_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NF * D, S, LANES), jnp.int32),
            pltpu.VMEM((NF, db_rows, LANES), jnp.int32),
            pltpu.VMEM((NF, wb_rows, LANES), jnp.int32),
            pltpu.VMEM((NF, 1, LANES), jnp.int32),
            pltpu.VMEM((n_seg * NF, 1, LANES), jnp.int32),
            pltpu.VMEM((R_work, LANES), jnp.int32),
            pltpu.VMEM((R_work, LANES), jnp.int32),
            pltpu.SMEM((_SMEM_SLOTS,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _worklog_kernel, config, n_chunks, done_rows, work_rows,
        n_seg, seg_rows, db_rows, wb_rows, chunk_rows,
    )
    out_shapes = (
        jax.ShapeDtypeStruct(src.shape, jnp.int32),
        jax.ShapeDtypeStruct(done.shape, jnp.int32),
        jax.ShapeDtypeStruct(work.shape, jnp.int32),
        jax.ShapeDtypeStruct((8,), jnp.int32),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases={1: 0, 5: 1, 6: 2},
        interpret=jax.default_backend() != "tpu",
        compiler_params=pltpu.CompilerParams(
            # the emission scratch (staging + two packing buffers) exceeds
            # the default 16M scoped-vmem budget at 128-sublane tiles
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(scalars, src, split2d, remove2d, aux, done, work)


def _state_to_stack(state: SimState, padded_rows: int):
    """SimState -> (NF, rows, 128) i32 stack."""
    c = state.capacity
    pad = padded_rows * LANES - c

    def prep(a):
        a = _from_typed(a)
        if pad:
            a = jnp.pad(a, (0, pad))
        return a.reshape(padded_rows, LANES)

    return jnp.stack(
        [
            prep(x)
            for x in (
                state.pos[:, 0], state.pos[:, 1], state.pos[:, 2],
                state.vel[:, 0], state.vel[:, 1], state.vel[:, 2],
                state.acc[:, 0], state.acc[:, 1], state.acc[:, 2],
                state.status, state.id_hi, state.id_lo,
            )
        ]
    )


def _stack_to_state(state: SimState, stack, n) -> SimState:
    c = state.capacity
    flat = [
        _to_typed(stack[f], name).reshape(-1)[:c]
        for f, name in enumerate(FIELD_NAMES)
    ]
    return state._replace(
        pos=jnp.stack(flat[0:3], axis=1),
        vel=jnp.stack(flat[3:6], axis=1),
        acc=jnp.stack(flat[6:9], axis=1),
        status=flat[9],
        id_hi=flat[10],
        id_lo=flat[11],
        n=n,
    )


def _round_up(x, m):
    return (x + m - 1) // m * m


def mobility_phase_worklog(
    state: SimState, poisson_step, table, config: SimConfig, t_steps
):
    """Work-list fixed point with in-kernel dense emission; returns
    (compacted_state, info).  The returned state is already compacted (all
    lanes live, status ALIVE) — poisson_step skips its compaction pass.

    info: pushes_lo/pushes_hi (exact base-2^30 pair), added (exact child
    count), overflow (bool).
    """
    if state.pos.dtype != jnp.float32:
        raise ValueError(
            "the fused Pallas engine is f32-only; use scheduler='sync' or "
            "'naive' for f64 oracle runs"
        )
    # Suspended-status packing caps the stamp domain (ADVICE r1): 15 bits.
    if config.poisson_timestep + 2 >= (1 << 15):
        raise ValueError(
            f"poisson_timestep={config.poisson_timestep} exceeds the fused "
            "engine's 15-bit stamp domain; use scheduler='naive' or 'sync'"
        )
    # 0 means "off" (one mixed log, same as 1); the ceiling is the SMEM
    # slot budget for per-segment element counters
    if not (0 <= config.worklog_start_buckets <= _WSEG_MAX):
        raise ValueError(
            f"worklog_start_buckets={config.worklog_start_buckets} outside "
            f"[0, {_WSEG_MAX}]: segment counters live in SMEM slots "
            f"{_WSEG}..{_SMEM_SLOTS - 1}"
        )
    if config.worklog_horizon < 0:
        raise ValueError(
            f"worklog_horizon={config.worklog_horizon} must be >= 0"
        )
    S, TILE = _tile_dims(config)
    c = state.capacity
    cap_rows = _round_up(c, LANES) // LANES
    padded_rows = _round_up(cap_rows, S)
    chunk = min(128, S)
    # done needs headroom for one DMA chunk beyond the capacity boundary
    done_rows = padded_rows + 2 * chunk
    # Work log sized for one pass's emissions (children + suspended).  Half
    # the capacity suffices in realistic split regimes; extreme-churn tables
    # that exceed it set the overflow flag and the bucketed runtime retries
    # at the next capacity (runtime._bucketed_step).  The floor covers the
    # DMA chunk slack that the fit test reserves.
    auto = cap_rows // 2
    n_seg = max(1, config.worklog_start_buckets)
    if n_seg > 1 or config.worklog_horizon:
        # A pass's emissions CONCENTRATE: horizon passes re-emit nearly the
        # whole live population into the 1-2 segments of the active
        # windows, and even without a horizon the start-linear routing
        # lands children/suspensions of adjacent steps in the same segment
        # (the r3b chip A/B measured seg4 dropping 47% of the population at
        # the 1M bench point when segments shared one pass's rows).  Every
        # segment must therefore be sized for a full pass — n_seg x memory.
        # Trace-time gate (config is static here, same pattern as the
        # spawn_depth clamp in push_mcc.py): beyond the byte budget the
        # n_seg-fold logs would crowd HBM at canonical 5e7 capacities, so
        # large buckets fall back to the single mixed log — a pure
        # rescheduling change, physics identical.
        auto_h = max(2, n_seg) * auto
        if NF * auto_h * LANES * 4 > 800 * 1024**2 and not config.worklog_rows:
            config = config.replace(
                worklog_start_buckets=1, worklog_horizon=0,
                worklog_align=False,
            )
            n_seg = 1
        else:
            auto = auto_h
    # each start segment needs S-aligned rows (tiles must not straddle a
    # segment base) and at least one DMA chunk of slack for the fit test
    work_rows = _round_up(
        max(config.worklog_rows or auto, n_seg * 4 * S, n_seg * 4 * chunk),
        n_seg * S,
    )

    scalars0 = jnp.stack(
        [
            jnp.asarray(poisson_step, jnp.int32).astype(jnp.int32),
            jnp.asarray(t_steps, jnp.int32),
            jnp.zeros((), jnp.int32),
        ]
    )

    src0 = _state_to_stack(state, padded_rows)
    done0 = jnp.zeros((NF, done_rows, LANES), jnp.int32)
    log_a = jnp.zeros((NF, work_rows, LANES), jnp.int32)
    log_b = jnp.zeros((NF, work_rows, LANES), jnp.int32)

    # pass 1: sweep the population, emit work into log A
    _, done1, log_a, ctr = _sweep(src0, done0, log_a, table, scalars0, config)

    def cond(carry):
        _a, _b, _done, _parity, _n_done, work_end, _ch, _pl, _ph, _ovf = carry
        return work_end > 0

    def body(carry):
        a, b, done, parity, n_done, _we, ch, p_lo, p_hi, ovf = carry
        scal = jnp.stack(
            [scalars0[0], scalars0[1], n_done.astype(jnp.int32)]
        )

        def a_to_b(ops):
            a_, b_, done_ = ops
            a_z, done_n, b_n, ctr_ = _sweep(a_, done_, b_, table, scal, config)
            return a_z, b_n, done_n, ctr_

        def b_to_a(ops):
            a_, b_, done_ = ops
            b_z, done_n, a_n, ctr_ = _sweep(b_, done_, a_, table, scal, config)
            return a_n, b_z, done_n, ctr_

        a, b, done, ctr_ = jax.lax.cond(parity == 0, a_to_b, b_to_a, (a, b, done))
        lo_sum = p_lo + ctr_[3]
        p_hi = p_hi + ctr_[4] + (lo_sum >> 30)
        p_lo = lo_sum & (_PUSH_BASE - 1)
        return (
            a, b, done, 1 - parity, ctr_[0], ctr_[1],
            ch + ctr_[2], p_lo, p_hi, ovf | ctr_[5],
        )

    init = (
        log_a, log_b, done1, jnp.zeros((), jnp.int32),
        ctr[0], ctr[1], ctr[2], ctr[3], ctr[4], ctr[5],
    )
    (_a, _b, done, _parity, n_done, _we, children, p_lo, p_hi, ovf) = (
        jax.lax.while_loop(cond, body, init)
    )

    n_live = jnp.minimum(n_done, c)
    overflow = (ovf > 0) | (n_done > c)
    new_state = _stack_to_state(state, done, n_live)
    info = {
        "pushes_lo": p_lo,
        "pushes_hi": p_hi,
        "added": children,
        "overflow": overflow,
    }
    return new_state, info


mobility_phase_worklog.self_compacting = True
