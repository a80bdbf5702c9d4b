"""How the table-lookup chunk band evolves DURING the mobility loop.

The resting-state probe (probe_chunks.py) sees band ~7; the kernel's cost
says the in-loop band is much wider.  This runs the bench config's mobility
steps with the pure-XLA physics (bit-identical draws) and records, per
mobility step: occupied nonzero chunks, the [hmin_nz, hmax_nz] band the
band0 sweep would visit, and the needband equivalent.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    # optional argv: number of warm Poisson steps before the instrumented
    # sweep (default 3 = the original churn-regime probe; 11 = the bench
    # run's LAST poisson step, where the windows have degraded ~25%)
    warm_p = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from particle_simulation_tpu import SimConfig, setup_particles
    from particle_simulation_tpu.cross_section import energy_to_index, load_table
    from particle_simulation_tpu.ops.step import (
        make_table_lookup,
        poisson_loop,
        state_to_particles,
        active_mask,
    )
    from particle_simulation_tpu.ops import physics
    from particle_simulation_tpu.ops.pallas.push_mcc import chunk_bound
    from particle_simulation_tpu.runtime import _bucket_size, _slice_state

    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=warm_p,
        poisson_timestep=100,
        grid_size=(256, 256, 256),
        scheduler="dynamic",
    )
    table = load_table()
    state = setup_particles(config)
    w = _bucket_size(config.init_n, config.capacity)
    cfg = config.replace(capacity=w)
    state = _slice_state(state, w)
    state, _ = poisson_loop(state, table, cfg, warm_p, first_index=0)
    from particle_simulation_tpu.ops.step import grid_phase

    state = jax.jit(functools.partial(grid_phase, config=cfg))(state)
    n0 = int(state.n)
    print(f"churn-regime n = {n0}", flush=True)

    n_chunks = 79
    bound = chunk_bound(table)[0, :n_chunks]  # (79,) f32
    lookup = make_table_lookup(table)

    @jax.jit
    def sweep(state):
        p0 = state_to_particles(state)

        def body(carry, t):
            p = carry
            active = active_mask(p.status, t)
            res = physics.update_particles(
                p, active=active, t=t, poisson_step=jnp.uint32(warm_p),
                dt=cfg.mobility_dt, sim_size=cfg.sim_size,
                split_chance=None, remove_chance=None, seed=cfg.seed,
                rng_rounds=cfg.rng_rounds, table_lookup=lookup,
            )
            # stats on the LIVE lanes' post-push energies (what the kernel
            # looks up at this step)
            moved = physics.INTEGRATORS[cfg.integrator](p, cfg.mobility_dt)
            e = physics.collision_energy(moved)
            idx = energy_to_index(e)
            hi = idx // 128
            live = active
            hi_nz = jnp.where(live & (hi > 0), hi, 0)
            occ = jnp.stack(
                [jnp.any(live & (hi == c)) for c in range(n_chunks)]
            )
            hmin_nz = jnp.min(jnp.where(live & (hi > 0), hi, n_chunks - 1))
            hmax_nz = jnp.max(jnp.where(live & (hi > 0), hi, 1))
            # needband: lanes whose u could collide
            u, _, _ = __import__(
                "particle_simulation_tpu.rng", fromlist=["rng"]
            ).step_draws(
                cfg.seed, p.id_hi, p.id_lo, jnp.uint32(warm_p), t, 0.0, 100.0,
                rounds=cfg.rng_rounds,
            )
            needy = live & (hi > 0) & (u < bound[jnp.clip(hi, 0, n_chunks - 1)])
            nmin = jnp.min(jnp.where(needy, hi, n_chunks - 1))
            nmax = jnp.max(jnp.where(needy, hi, 1))
            # per-TILE band (what each kernel tile's fori_loop actually pays)
            tile = 128 * 128
            hi_t = hi.reshape(-1, tile)
            m_t = (live & (hi > 0)).reshape(-1, tile)
            tmin = jnp.min(jnp.where(m_t, hi_t, n_chunks - 1), axis=1)
            tmax = jnp.max(jnp.where(m_t, hi_t, 1), axis=1)
            tband = jnp.maximum(tmax - tmin + 1, 0)
            # escapee stats: lanes beyond the static window (K=8) — what the
            # staticthresh over-tail sweeps.  Per-tile trip count =
            # [max(K+1, tile min-over), tile max-over] span
            K = 8
            o_t = m_t & (hi_t > K)
            omin = jnp.min(jnp.where(o_t, hi_t, n_chunks - 1), axis=1)
            omax = jnp.max(jnp.where(o_t, hi_t, 1), axis=1)
            otrips = jnp.maximum(omax - jnp.maximum(K + 1, omin) + 1, 0)
            stats = (
                jnp.sum(occ), hmin_nz, hmax_nz,
                jnp.maximum(hmax_nz - hmin_nz + 1, 0),
                jnp.maximum(nmax - nmin + 1, 0),
                jnp.sum(live),
                jnp.mean(tband.astype(jnp.float32)),
                jnp.sum(live & (hi > K)),
                jnp.mean(otrips.astype(jnp.float32)),
                jnp.max(otrips),
            )
            return res.particles, stats

        _, stats = jax.lax.scan(body, p0, jnp.arange(1, 101))
        return stats

    occ, hmin, hmax, band, nband, live, tband, nover, otrips, omaxt = [
        np.asarray(x) for x in sweep(state)
    ]
    print("t, occupied, hmin, hmax, band0_band, needband_band, live, "
          "tileband, n_over, otrips_mean, otrips_max")
    for t in range(0, 100, 5):
        print(f"{t+1:3d} {occ[t]:9d} {hmin[t]:5d} {hmax[t]:5d} "
              f"{band[t]:6d} {nband[t]:7d} {live[t]:9d} {tband[t]:8.1f} "
              f"{nover[t]:8d} {otrips[t]:8.1f} {omaxt[t]:6d}")
    print(f"mean band0 band = {band.mean():.1f}  "
          f"mean needband band = {nband.mean():.1f}  "
          f"mean occupied = {occ.mean():.1f}  "
          f"mean tile band = {tband.mean():.1f}  "
          f"mean over-trips/tile = {otrips.mean():.1f}")


if __name__ == "__main__":
    main()
