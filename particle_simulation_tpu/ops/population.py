"""Dynamic-population machinery under static shapes: spawn append and
dead-particle compaction.

The reference needs four CUDA schedulers + warp-ballot stream compaction
(src/pic.cu:19-357) because it mutates a shared work queue inside kernels.
XLA's functional model replaces all of that with data-parallel primitives —
and because XLA:TPU lowers scatter terribly (~250 MB/s measured) while
gathers run at near memory bandwidth, everything here is **gather-only**:

  destination slot j pulls its source with a vectorized binary search over
  the cumulative count of the source mask (``searchsorted(cumsum(mask),
  rank)``), instead of sources scattering to destinations.  This preserves
  order (stable), is deterministic, and replaced a 3.1 s scatter append with
  a ~10 ms gather pass at the 1M-particle benchmark point.

Semantics preserved from the reference:
  * children land in slots [n, n+k) in source order; children beyond
    capacity are dropped but still counted in ``n`` so overflow is
    detectable (src/pic.cu:127-131, 543-545);
  * compaction closes ranks preserving order and resets survivors to ALIVE
    (remove_dead_particles + buffer flip, src/pic.cu:320-357, 491-492).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import STATUS_ALIVE, STATUS_DEAD, STATUS_EMPTY
from ..state import SimState
from .physics import Particles


def is_live(status) -> jnp.ndarray:
    """Slots holding a live particle (alive-from-start or spawned-this-step)."""
    return (status == STATUS_ALIVE) | (status > 0)


def gather_ranked(mask, num_dest):
    """For each destination rank r in [0, num_dest): the index of the
    (r+1)-th True in ``mask`` (undefined where r >= sum(mask)).

    Gather-only stream-compaction index: searchsorted over the cumulative
    mask count.
    """
    cum = jnp.cumsum(mask.astype(jnp.int32))
    ranks = jnp.arange(1, num_dest + 1, dtype=jnp.int32)
    src = jnp.searchsorted(cum, ranks, side="left")
    return jnp.minimum(src, mask.shape[0] - 1), cum[-1]


def append_children(state: SimState, spawn, child: Particles) -> SimState:
    """Place this step's children at slots [n, n+k) in source order."""
    c = state.capacity
    slot = jnp.arange(c, dtype=jnp.int32)
    # rank of destination slot j among new children: j - n (valid if in [0,k))
    src, k = gather_ranked(spawn, c)
    # source staged index for destination j is src[j - n]; express via a
    # shifted gather: dest_rank[j] = j - n
    dest_rank = slot - state.n
    take = jnp.clip(dest_rank, 0, c - 1)
    src_for_dest = src[take]
    is_new = (dest_rank >= 0) & (dest_rank < k)

    def merge(old, child_arr):
        gathered = child_arr[src_for_dest]
        if old.ndim > 1:
            mask = is_new[(...,) + (None,) * (old.ndim - 1)]
        else:
            mask = is_new
        return jnp.where(mask, gathered.astype(old.dtype), old)

    pos = merge(state.pos, jnp.stack([child.px, child.py, child.pz], axis=1))
    vel = merge(state.vel, jnp.stack([child.vx, child.vy, child.vz], axis=1))
    acc = merge(state.acc, jnp.stack([child.ax, child.ay, child.az], axis=1))
    status = merge(state.status, child.status)
    id_hi = merge(state.id_hi, child.id_hi)
    id_lo = merge(state.id_lo, child.id_lo)
    return state._replace(
        pos=pos, vel=vel, acc=acc, status=status,
        id_hi=id_hi, id_lo=id_lo, n=state.n + k)


def append_from(state: SimState, valid, fields: Particles) -> SimState:
    """Generalized append: pull valid entries from arbitrarily-sized staged
    component arrays (e.g. the fused kernel's (D * padded_capacity,) child
    staging) into slots [n, n+k).  Gather-only."""
    c = state.capacity
    slot = jnp.arange(c, dtype=jnp.int32)
    src, k = gather_ranked(valid, c)
    dest_rank = slot - state.n
    take = jnp.clip(dest_rank, 0, c - 1)
    src_for_dest = src[take]
    is_new = (dest_rank >= 0) & (dest_rank < k)

    def merge1(old, staged):
        return jnp.where(is_new, staged[src_for_dest].astype(old.dtype), old)

    def merge3(old, sx, sy, sz):
        g = jnp.stack(
            [sx[src_for_dest], sy[src_for_dest], sz[src_for_dest]], axis=1
        )
        return jnp.where(is_new[:, None], g.astype(old.dtype), old)

    return state._replace(
        pos=merge3(state.pos, fields.px, fields.py, fields.pz),
        vel=merge3(state.vel, fields.vx, fields.vy, fields.vz),
        acc=merge3(state.acc, fields.ax, fields.ay, fields.az),
        status=merge1(state.status, fields.status),
        id_hi=merge1(state.id_hi, fields.id_hi),
        id_lo=merge1(state.id_lo, fields.id_lo),
        n=state.n + k,
    )


def compact(state: SimState) -> SimState:
    """Drop dead particles, close ranks (stable), reset survivors to ALIVE."""
    c = state.capacity
    slot = jnp.arange(c, dtype=jnp.int32)
    live = is_live(state.status) & (slot < state.n_clamped)
    src, n_new = gather_ranked(live, c)
    keep = slot < n_new

    def take(arr):
        g = arr[src]
        mask = keep[(...,) + (None,) * (arr.ndim - 1)] if arr.ndim > 1 else keep
        return jnp.where(mask, g, jnp.zeros((), arr.dtype))

    return SimState(
        pos=take(state.pos),
        vel=take(state.vel),
        acc=take(state.acc),
        status=jnp.where(keep, STATUS_ALIVE, STATUS_EMPTY).astype(jnp.int32),
        id_hi=take(state.id_hi),
        id_lo=take(state.id_lo),
        n=n_new,
    )
