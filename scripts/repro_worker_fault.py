"""Minimal repro / bisect for the TPU worker fault at >=7.3M-particle
buckets (canonical 512^3 config, naive engine — VERDICT r2 #3).

Observed: `jax.errors.JaxRuntimeError: UNAVAILABLE: TPU worker process
crashed or restarted ("kernel fault")` when the canonical sweep's naive
column enters the T>=300 avalanche buckets.  Reproduced in round 3 WITH the
bbox-subgrid field phase, so the 512 MB grids are ruled out; the dynamic
(worklog) engine runs far larger populations without faulting, so the
suspects are the XLA population ops the naive/sync cadences use and the
worklog engine does not.

Each candidate runs in its OWN python process (a worker crash kills the
process's backend): `python scripts/repro_worker_fault.py <op> <w>`.
Driver: `bash scripts/repro_worker_fault.sh` runs the ladder and records
which op faults.

Ops:
  naive_step    — one full naive Poisson step (expected to fault at 8M)
  update        — vectorized update_particles over w lanes (physics+lookup)
  append_fast   — append_children, spawn count under the 128k window
  append_slow   — append_children, spawn count forcing the full-width path
  compact       — argsort + packed row gather compaction
  argsort       — bare stable argsort at w
  gather12      — bare packed (w, 12) row gather
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def build_state(w, grid, cell):
    """Synthetic all-live state: w particles uniform in the 62-cell seed
    cube (the canonical distribution), genealogy ids = slot."""
    from particle_simulation_tpu import SimConfig
    from particle_simulation_tpu.state import setup_particles

    cfg = SimConfig(
        init_n=w, capacity=w, poisson_steps=1, poisson_timestep=1,
        grid_size=grid, scheduler="naive",
    )
    return setup_particles(cfg), cfg


def main():
    op = sys.argv[1]
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 8_000_000
    grid = (512, 512, 512)
    state, cfg = build_state(w, grid, 1e-2)
    from particle_simulation_tpu.cross_section import bundled_paths, load_table
    from particle_simulation_tpu.ops import population
    from particle_simulation_tpu.ops.step import poisson_step

    table = load_table(bundled_paths()[1])  # constant 50/50: heavy churn
    cfg = cfg.replace(cross_section_path=bundled_paths()[1])

    if op == "naive_step":
        st, m = poisson_step(state, jnp.uint32(0), table, cfg.replace(
            poisson_timestep=2))
        print("naive_step ok, n =", int(m["n"]))
    elif op == "update":
        from particle_simulation_tpu.ops.step import (
            make_table_lookup, state_to_particles,
        )
        from particle_simulation_tpu.ops.physics import update_particles

        @jax.jit
        def f(st):
            p = state_to_particles(st)
            active = population.is_live(p.status)
            res = update_particles(
                p, active=active, t=jnp.int32(1), poisson_step=jnp.uint32(0),
                dt=cfg.mobility_dt, sim_size=cfg.sim_size,
                split_chance=None, remove_chance=None, seed=cfg.seed,
                rng_rounds=cfg.rng_rounds, integrator="leapfrog",
                collision_model="reverse",
                table_lookup=make_table_lookup(table),
            )
            return res.particles.px, res.spawn

        px, spawn = f(state)
        print("update ok, spawns =", int(jnp.sum(spawn)))
    elif op in ("append_fast", "append_slow"):
        from particle_simulation_tpu.ops.step import state_to_particles

        k = 1000 if op == "append_fast" else 1_000_000  # window is 131072
        spawn = jnp.arange(w) < k
        child = state_to_particles(state)
        half = state._replace(n=jnp.int32(w // 2))

        @jax.jit
        def f(st, sp):
            return population.append_children(st, sp, child)

        out = f(half, spawn)
        print(op, "ok, n =", int(out.n))
    elif op == "compact":
        dead = jnp.arange(w) % 3 == 0
        st = state._replace(
            status=jnp.where(dead, jnp.int32(-2), state.status)
        )
        out = jax.jit(population.compact)(st)
        print("compact ok, n =", int(out.n))
    elif op == "argsort":
        x = (jnp.arange(w, dtype=jnp.int32) * 2654435761) % 3

        @jax.jit
        def f(x):
            return jnp.argsort((x == 0).astype(jnp.int8), stable=True)

        out = f(x)
        print("argsort ok,", int(out[0]))
    elif op == "gather12":
        rows = jnp.zeros((w, 12), jnp.int32)
        idx = jnp.minimum(jnp.arange(w, dtype=jnp.int32), w - 1)

        @jax.jit
        def f(rows, idx):
            return rows.at[idx].get(indices_are_sorted=True,
                                    mode="promise_in_bounds")

        out = f(rows, idx)
        print("gather12 ok,", int(jnp.sum(out[0])))
    else:
        raise SystemExit(f"unknown op {op}")


if __name__ == "__main__":
    main()
