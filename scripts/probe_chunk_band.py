"""Probe: which threshold-table chunks does the bench population occupy?

Runs the bench configuration (1M electrons, T=100, 256^3) on CPU via the
pure-XLA naive scheduler (bit-identical physics to the fused kernel — the
genealogy-keyed draws make the multiset engine-independent) and histograms
``hi = energy_to_index(|v|^2) // 128`` at every Poisson boundary.

Motivation: the kernel's staticthresh lookup statically unrolls chunks
0..lookup_static_chunks (default 8).  Each static visit costs ~3 vector
ops on the (S, L) tile in a VMEM-bandwidth-bound loop; if the live band
never leaves chunks 0..3 at the bench point, lowering the unroll saves
~40% of the lookup's op count with zero exactness risk (the dynamic tail
loop covers excursions).
"""

import sys

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from particle_simulation_tpu import SimConfig
from particle_simulation_tpu.cross_section import energy_to_index, load_table
from particle_simulation_tpu.runtime import run_pic

LANES = 128

config = SimConfig(
    init_n=1_000_000,
    capacity=2_000_000,
    poisson_steps=18,
    poisson_timestep=100,
    grid_size=(256, 256, 256),
    scheduler="naive",
    verbose=1,
)


def report(t, state):
    n = int(state.n_clamped)
    alive = np.asarray(state.status[:n]) == -1
    vel = np.asarray(state.vel[:n])[alive]
    e = (vel * vel).sum(axis=1)
    hi = np.asarray(energy_to_index(jnp.asarray(e))) // LANES
    hist = np.bincount(hi, minlength=12)
    top = hi.max() if hi.size else 0
    frac = np.cumsum(hist) / max(hi.size, 1)
    kcover = [int(np.searchsorted(frac, q)) for q in (0.5, 0.99, 0.9999, 1.0)]
    print(
        f"t={t:3d} n={n:8d} max_chunk={top:3d} "
        f"chunks(50%/99%/99.99%/100%)={kcover} "
        f"hist[:10]={hist[:10].tolist()}",
        flush=True,
    )


run_pic(config, load_table(), on_step=report, print_header=False)
