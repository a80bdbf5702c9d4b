"""A/B the staticthresh unroll width at the bench point.

Each STATIC chunk visit in the fused kernel's lookup costs ~3.4 ms per
bench run (measured; the T-loop is VMEM-bandwidth-bound, so op count is
the only lever).  The default ``lookup_static_chunks=8`` spends ~30 ms of
the ~55 ms step on 9 visits; if the bench population's energy band
occupies fewer chunks (scripts/probe_chunk_band.py measures it), a lower
unroll is pure profit — lanes beyond the unroll fall into the dynamic
tail loop, which is exact at ~2x the per-visit cost, so correctness is
never at stake.

Usage: python scripts/k_sweep.py [K ...]   (default 2 3 4 6 8)
Writes out/data/k_sweep.csv: k,window_s,pushes_per_s (best of N windows).
"""

import csv
import os
import sys
import time

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particle_simulation_tpu import SimConfig, setup_particles
from particle_simulation_tpu.cross_section import load_table
from particle_simulation_tpu.ops.step import poisson_loop
from particle_simulation_tpu.runtime import _bucket_size, _slice_state

WARM_STEPS = 3
TIMED_STEPS = 3
N_WINDOWS = 3

KS = [int(a) for a in sys.argv[1:]] or [2, 3, 4, 6, 8]

base = SimConfig(
    init_n=1_000_000,
    capacity=2_000_000,
    poisson_steps=WARM_STEPS + N_WINDOWS * TIMED_STEPS,
    poisson_timestep=100,
    grid_size=(256, 256, 256),
    scheduler="dynamic",
)
table = load_table()

rows = []
w = _bucket_size(base.init_n, base.capacity)
for k in KS:
    config = base.replace(lookup_static_chunks=k)
    # bench.py's exact-retry climb: the avalanche overflows the first
    # ladder buckets at this config, so redo one bucket up until clean
    # (at w == capacity, reference capacity semantics apply: children
    # beyond the container are dropped with the overflow flag set, as in
    # src/pic.cu:544 — identical across K, so the A/B stays fair).
    while True:
        full_state = setup_particles(config)
        state = _slice_state(full_state, w) if w < config.capacity else full_state
        cfg_w = config.replace(capacity=w)

        t0 = time.perf_counter()
        state, m0 = poisson_loop(state, table, cfg_w, WARM_STEPS, first_index=0)
        _ = int(state.n)
        warm_s = time.perf_counter() - t0

        best = (0.0, 0.0)
        overflow = bool(jnp.any(m0["overflow"]))
        idx = WARM_STEPS
        for _ in range(N_WINDOWS):
            t0 = time.perf_counter()
            state, metrics = poisson_loop(
                state, table, cfg_w, TIMED_STEPS, first_index=idx
            )
            _ = int(state.n)
            elapsed = time.perf_counter() - t0
            idx += TIMED_STEPS
            lo = [int(x) for x in metrics["pushes_lo"]]
            hi = [int(x) for x in metrics["pushes_hi"]]
            pushes = float(sum(l + (h << 30) for l, h in zip(lo, hi)))
            rate = pushes / elapsed
            if rate > best[1]:
                best = (elapsed, rate)
            overflow = overflow or bool(jnp.any(metrics["overflow"]))
        if w < config.capacity and overflow:
            w = _bucket_size(w + 1, config.capacity)
            continue
        break
    rows.append((k, best[0], best[1]))
    print(f"K={k}: warm {warm_s:.1f}s best window {best[0]:.3f}s "
          f"-> {best[1]:.4g} pushes/s", flush=True)

os.makedirs("out/data", exist_ok=True)
with open("out/data/k_sweep.csv", "w", newline="") as f:
    wtr = csv.writer(f)
    wtr.writerow(["lookup_static_chunks", "window_s", "pushes_per_s"])
    wtr.writerows(rows)
print("wrote out/data/k_sweep.csv")
