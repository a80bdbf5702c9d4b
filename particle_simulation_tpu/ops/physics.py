"""Per-particle physics: leapfrog push, bounds kill, Monte-Carlo collision.

One shape-polymorphic implementation over separate component arrays, shared
verbatim by the vectorized pure-JAX path (ops/step.py) and the fused Pallas
engine (ops/pallas/push_mcc.py) so both are bit-exact.

Reference semantics reproduced:
  * leapfrog kick-drift-kick with v MINUS a*dt/2 (the reference's sign
    convention treats `acceleration` as the force per unit mass on the
    electron from positive neighbour charge; src/particle_move.cu:22-39);
  * out-of-bounds on any axis kills the particle before any collision roll
    (src/particle_move.cu:41-52, called first in updateParticle :83-87);
  * collision: one uniform draw in [0,100); energy = |v|^2 (no 1/2 m);
    log-bucket table lookup; rand < split -> ionize (child = copy of the
    post-push parent with spawn-step stamp, parent velocity reverses);
    elif rand < split+remove -> absorbed (src/particle_move.cu:55-80).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import rng
from ..constants import STATUS_DEAD


class Particles(NamedTuple):
    """Component-wise particle bundle; every field has the same shape."""

    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    vx: jnp.ndarray
    vy: jnp.ndarray
    vz: jnp.ndarray
    ax: jnp.ndarray
    ay: jnp.ndarray
    az: jnp.ndarray
    status: jnp.ndarray  # i32
    id_hi: jnp.ndarray   # u32
    id_lo: jnp.ndarray   # u32


class StepResult(NamedTuple):
    particles: Particles     # updated parents (only valid where `active`)
    spawn: jnp.ndarray       # bool: a child was created this step
    child: Particles         # child fields (only valid where `spawn`)


def leapfrog(p: Particles, dt) -> Particles:
    fdt = p.vx.dtype
    dt = jnp.asarray(dt, fdt)
    half = dt / 2
    ax, ay, az = (p.ax.astype(fdt), p.ay.astype(fdt), p.az.astype(fdt))
    vx = p.vx - ax * half
    vy = p.vy - ay * half
    vz = p.vz - az * half
    px = p.px + vx * dt
    py = p.py + vy * dt
    pz = p.pz + vz * dt
    vx = vx - ax * half
    vy = vy - ay * half
    vz = vz - az * half
    return p._replace(px=px, py=py, pz=pz, vx=vx, vy=vy, vz=vz)


def out_of_bounds(p: Particles, sim_size) -> jnp.ndarray:
    sx, sy, sz = (jnp.asarray(s, p.px.dtype) for s in sim_size)
    zero = jnp.zeros((), p.px.dtype)
    return (
        (p.px < zero) | (p.px >= sx)
        | (p.py < zero) | (p.py >= sy)
        | (p.pz < zero) | (p.pz >= sz)
    )


def collision_energy(p: Particles):
    return p.vx * p.vx + p.vy * p.vy + p.vz * p.vz


def update_particles(
    p: Particles,
    active,
    t,
    poisson_step,
    dt,
    sim_size,
    split_chance,
    remove_chance,
    seed,
    table_lookup,
    rng_rounds: int = 20,
) -> StepResult:
    """One mobility step for every lane; inactive lanes pass through.

    ``table_lookup(energy) -> (split, remove)`` is injected so the pure-JAX
    path can use XLA gather while the Pallas engine substitutes its VMEM
    lookup; when ``split_chance``/``remove_chance`` are given (pre-gathered)
    the callable may be None.
    """
    moved = leapfrog(p, dt)
    oob = out_of_bounds(moved, sim_size)

    u, child_hi, child_lo = rng.step_draws(
        seed, p.id_hi, p.id_lo, poisson_step, t, 0.0, 100.0, rounds=rng_rounds
    )
    energy = collision_energy(moved)
    if table_lookup is not None:
        split_chance, remove_chance = table_lookup(energy)
    u = u.astype(split_chance.dtype)

    splits = active & ~oob & (u < split_chance)
    dies_mcc = active & ~oob & ~splits & (u < split_chance + remove_chance)
    dies = (active & oob) | dies_mcc
    t_i32 = jnp.asarray(t, jnp.int32)
    child = moved._replace(
        status=jnp.where(splits, t_i32, 0).astype(jnp.int32),
        id_hi=jnp.where(splits, child_hi, 0),
        id_lo=jnp.where(splits, child_lo, 0),
    )

    # Parent: position/velocity advance where active; velocity flips on split;
    # status -> DEAD where killed.
    def sel(new, old):
        return jnp.where(active, new, old)

    flip = jnp.where(splits, -jnp.ones((), moved.vx.dtype), jnp.ones((), moved.vx.dtype))
    parents = p._replace(
        px=sel(moved.px, p.px),
        py=sel(moved.py, p.py),
        pz=sel(moved.pz, p.pz),
        vx=sel(moved.vx * flip, p.vx),
        vy=sel(moved.vy * flip, p.vy),
        vz=sel(moved.vz * flip, p.vz),
        status=jnp.where(dies, jnp.int32(STATUS_DEAD), p.status),
    )
    return StepResult(particles=parents, spawn=splits, child=child)
