"""Weak-scaling sweep over a device mesh: per-step wall time vs shard count
with constant per-shard workload (SURVEY.md §2.3 / §5.8 contract).

IMPORTANT CAVEAT (recorded into the CSV header): this environment exposes a
single TPU chip, so the sweep runs on a virtual CPU mesh
(--xla_force_host_platform_device_count).  A virtual mesh time-slices ONE
host CPU across all "devices" — per-step wall time CANNOT stay flat as the
mesh grows, so the timing column here validates only that the sharded path
executes end-to-end; it is NOT a weak-scaling measurement.  What CAN be
recorded exactly is the communication model: the only per-step collective is
one charge-grid psum (+O(1) scalar psums), so each row carries the psum'd
bytes and a v5p ICI cost estimate; everything else in the step is
shard-local by construction (parallel/sharded.py).  On real multi-chip
hardware, rerun with WEAK_SCALING_PLATFORM=tpu to get true timings.

    python scripts/weak_scaling.py [max_devices] [out_csv]

Writes out/data/weak_scaling_mesh.csv (comment header + columns
mesh,n_global_init,per_step_s,final_n,psum_mib_per_step,est_ici_allreduce_ms).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
OUT = sys.argv[2] if len(sys.argv) > 2 else "out/data/weak_scaling_mesh.csv"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={MAX_DEV}"
).strip()

import jax  # noqa: E402

# Decide the platform BEFORE any backend touch: jax.default_backend() would
# initialize the (single-chip) TPU tunnel and the CPU override would then be
# ignored — every "mesh" silently becomes 1 device.  Opt into real hardware
# with WEAK_SCALING_PLATFORM=tpu on an actual multi-chip host.
if os.environ.get("WEAK_SCALING_PLATFORM", "cpu") != "tpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from particle_simulation_tpu import SimConfig  # noqa: E402
from particle_simulation_tpu.cross_section import load_table  # noqa: E402
from particle_simulation_tpu.parallel.sharded import (  # noqa: E402
    make_mesh,
    setup_sharded,
    sharded_poisson_step,
)


def main():
    per_shard = SimConfig(
        init_n=5_000,
        capacity=65_536,        # per shard
        poisson_steps=4,
        poisson_timestep=10,
        grid_size=(32, 32, 32),
        scheduler="dynamic",
        kernel_sublanes=8,
    )
    table = load_table()
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    # Collective cost model: the one per-step collective is the charge-grid
    # all-reduce (psum of an i32 grid, parallel/sharded.py:103).  Ring
    # all-reduce moves 2*S*(N-1)/N bytes per chip; v5p ICI is ~100 GB/s
    # usable per chip per direction (scaling-book figure; order-of-magnitude
    # estimate, not a measurement).
    grid_bytes = 4 * (
        per_shard.grid_size[0] * per_shard.grid_size[1] * per_shard.grid_size[2]
    )
    ici_bw = 100e9  # bytes/s, v5p-class ICI per chip (estimate)
    with open(OUT, "w") as f:
        f.write(
            "# Virtual CPU mesh on ONE host: per_step_s validates the sharded\n"
            "# path only — it is NOT a weak-scaling timing (a single CPU is\n"
            "# time-sliced across all shards, so time rises with mesh size by\n"
            "# construction).  The communication model columns are exact:\n"
            "# psum_mib_per_step is the bytes all-reduced per step (the ONLY\n"
            "# per-step collective: one i32 charge-grid psum; mobility/spawn/\n"
            "# compaction are shard-local), est_ici_allreduce_ms prices it at\n"
            f"# ~{ici_bw/1e9:.0f} GB/s/chip ring all-reduce on v5p-class ICI.\n"
            "# Rerun with WEAK_SCALING_PLATFORM=tpu on real multi-chip hardware\n"
            "# for true timings.\n"
        )
        f.write(
            "mesh,n_global_init,per_step_s,final_n,"
            "psum_mib_per_step,est_ici_allreduce_ms\n"
        )
        n = 1
        while n <= MAX_DEV:
            mesh = make_mesh(n)
            assert mesh.devices.size == n, (
                f"mesh has {mesh.devices.size} devices, wanted {n} — "
                "platform forcing failed?"
            )
            step = sharded_poisson_step(mesh, per_shard)
            state = setup_sharded(per_shard, mesh)
            # warm (compile)
            state, m = step(state, jnp.uint32(0), table)
            _ = int(m["n"])
            t0 = time.perf_counter()
            steps = per_shard.poisson_steps - 1
            for t in range(1, per_shard.poisson_steps):
                state, m = step(state, jnp.uint32(t), table)
            final_n = int(m["n"])
            dt = (time.perf_counter() - t0) / max(steps, 1)
            moved = 2 * grid_bytes * (n - 1) / n  # ring all-reduce bytes/chip
            f.write(
                f"{n},{per_shard.init_n * n},{dt:.6f},{final_n},"
                f"{moved / 2**20:.3f},{moved / ici_bw * 1e3:.4f}\n"
            )
            f.flush()
            print(f"mesh={n}: {dt*1e3:9.1f} ms/step  final_n={final_n}",
                  flush=True)
            n *= 2


if __name__ == "__main__":
    main()
