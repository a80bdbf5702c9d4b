"""Where does the population LIVE in energy space, step by step? (chip probe)

The lookup redesigns all hinge on which table chunks the live lanes occupy:

  * bucket-chunks  hi = energy_to_index(E) >> 7   (the current polythresh /
    staticthresh chunking: 128 log10-buckets per chunk);
  * exponent-chunks g = clamp((bitcast(E) >> 23) - 106, 0, 127)  (the
    bitcast-indexed candidate: one f32 octave per chunk, no log10).

A bitcast-indexed exact mode would NaN-poison chunks it cannot fit —
notably the i^0.1 kink (exponent chunks ~1-3, energies just above 2^-20)
— sending their lanes to the fallback sweep EVERY step.  This probe
measures, at the bench point, what fraction of live lanes sit there during
the early (fastest) windows, i.e. whether poisoning those chunks would
sink the best-window metric the way the r3i v1 global margin did.

Prints per Poisson step: live n, %E==0, %bucket-chunk 0, the top occupied
exponent chunks, and % in exponent chunks 1..4.

    python scripts/probe_energy_occupancy.py [T] [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.cross_section import energy_to_index, load_table
from particle_simulation_tpu.ops.step import poisson_loop
from particle_simulation_tpu.runtime import _bucket_size, _slice_state


@jax.jit
def occupancy(state):
    alive = (state.status == -1) | (state.status > 0)
    v = state.vel.astype(jnp.float32)
    e = jnp.where(alive, jnp.sum(v * v, axis=1), jnp.float32(0.0))
    x = jax.lax.bitcast_convert_type(e, jnp.int32)
    g = jnp.clip((x >> 23) - 106, 0, 127)
    hi = energy_to_index(e) // 128
    n_live = jnp.sum(alive.astype(jnp.int32))
    w = alive.astype(jnp.int32)

    def hist(idx, n):  # probe-only scatter histogram (fine off the hot path)
        return jnp.zeros((n,), jnp.int32).at[jnp.clip(idx, 0, n - 1)].add(w)

    return (
        n_live,
        jnp.sum((alive & (e == 0.0)).astype(jnp.int32)),
        hist(g, 128),
        hist(hi, 100),
    )


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    config = SimConfig(
        init_n=1_000_000,
        capacity=2_000_000,
        poisson_steps=steps,
        poisson_timestep=T,
        grid_size=(256, 256, 256),
        scheduler="dynamic",
    )
    table = load_table()
    w = _bucket_size(config.init_n, config.capacity)
    state = _slice_state(setup_particles(config), w)
    cfg_w = config.replace(capacity=w)
    for step in range(steps):
        state, _ = poisson_loop(state, table, cfg_w, 1, first_index=step)
        n, nz, gh, hih = occupancy(state)
        n, nz = int(n), int(nz)
        gh = [int(v) for v in gh]
        hih = [int(v) for v in hih]
        top_g = sorted(range(128), key=lambda i: -gh[i])[:8]
        kink = sum(gh[1:5])
        print(
            f"step {step + 1:3d}  n={n}  E==0 {100.0 * nz / n:5.1f}%  "
            f"hi0 {100.0 * hih[0] / n:5.1f}%  "
            f"g[1..4] {100.0 * kink / n:5.2f}%  "
            f"top_g {[(i, round(100.0 * gh[i] / n, 1)) for i in top_g if gh[i]]}",
            flush=True,
        )
        print(
            f"          hi occupancy: "
            f"{[(i, round(100.0 * v / n, 1)) for i, v in enumerate(hih) if v > n // 200]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
