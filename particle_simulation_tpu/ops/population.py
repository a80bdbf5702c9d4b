"""Dynamic-population machinery under static shapes: spawn append and
dead-particle compaction.

The reference needs four CUDA schedulers + warp-ballot stream compaction
(src/pic.cu:19-357) because it mutates a shared work queue inside kernels.
XLA's functional model replaces all of that with two data-parallel
primitives:

  * ``append_children``: masked-prefix-sum ranks place each spawned child at
    slot n + rank, dropping overflow beyond capacity while still counting it
    (the reference's atomic counter also over-counts then clamps,
    src/pic.cu:127-131, 543-545);
  * ``compact``: order-preserving stream compaction of live particles via a
    stable sort on the dead mask — the remove_dead_particles equivalent
    (src/pic.cu:320-357), but deterministic in output order, which the
    warp-atomic original is not.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..constants import STATUS_ALIVE, STATUS_DEAD, STATUS_EMPTY
from ..state import SimState
from .physics import Particles


def is_live(status) -> jnp.ndarray:
    """Slots holding a live particle (alive-from-start or spawned-this-step)."""
    return (status == STATUS_ALIVE) | (status > 0)


def append_children(state: SimState, spawn, child: Particles) -> SimState:
    """Scatter this step's children into slots [n, n + k) in parent-slot
    order.  Children beyond capacity are dropped but counted in ``n`` so
    overflow is detectable (reference behavior)."""
    c = state.capacity
    ranks = jnp.cumsum(spawn.astype(jnp.int32))
    k = ranks[-1]
    dest = state.n + ranks - 1
    dest = jnp.where(spawn & (dest < c), dest, c)  # c == dropped (OOB)

    def put(arr, vals):
        return arr.at[dest].set(
            vals.astype(arr.dtype), mode="drop",
            indices_are_sorted=False, unique_indices=True)

    pos = put(state.pos, jnp.stack([child.px, child.py, child.pz], axis=1))
    vel = put(state.vel, jnp.stack([child.vx, child.vy, child.vz], axis=1))
    acc = put(state.acc, jnp.stack([child.ax, child.ay, child.az], axis=1))
    status = put(state.status, child.status)
    id_hi = put(state.id_hi, child.id_hi)
    id_lo = put(state.id_lo, child.id_lo)
    return state._replace(
        pos=pos, vel=vel, acc=acc, status=status,
        id_hi=id_hi, id_lo=id_lo, n=state.n + k)


def compact(state: SimState) -> SimState:
    """Drop dead particles, close ranks (stable), reset survivors to ALIVE.

    Equivalent of remove_dead_particles + the buffer flip
    (src/pic.cu:320-357, 491-492) as a functional gather.
    """
    c = state.capacity
    slot = jnp.arange(c, dtype=jnp.int32)
    live = is_live(state.status) & (slot < state.n_clamped)
    n_new = jnp.sum(live.astype(jnp.int32))
    # Stable partition: live slots first, original order preserved.
    perm = jnp.argsort(jnp.where(live, 0, 1), stable=True)
    keep = slot < n_new

    def take(arr, fill=0):
        g = arr[perm]
        mask = keep[(...,) + (None,) * (arr.ndim - 1)] if arr.ndim > 1 else keep
        return jnp.where(mask, g, jnp.asarray(fill, arr.dtype))

    return SimState(
        pos=take(state.pos),
        vel=take(state.vel),
        acc=take(state.acc),
        status=jnp.where(keep, STATUS_ALIVE, STATUS_EMPTY).astype(jnp.int32),
        id_hi=take(state.id_hi),
        id_lo=take(state.id_lo),
        n=n_new,
    )
