"""Weak-scaling sweep over a device mesh: per-step wall time vs shard count
with constant per-shard workload (SURVEY.md §2.3 / §5.8 contract).

On real multi-chip hardware this measures ICI scaling of the one collective
per step (the charge-grid psum).  Without it (this environment exposes a
single chip), the sweep runs on a virtual CPU mesh
(--xla_force_host_platform_device_count), which validates the sharded path
end-to-end and records the artifact shape; absolute times are CPU-bound.

    python scripts/weak_scaling.py [max_devices] [out_csv]

Writes out/data/weak_scaling_mesh.csv: mesh,n_global,per_step_s,final_n.
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
    with open(OUT, "w") as f:
        f.write("mesh,n_global_init,per_step_s,final_n\n")
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
            f.write(f"{n},{per_shard.init_n * n},{dt:.6f},{final_n}\n")
            f.flush()
            print(f"mesh={n}: {dt*1e3:9.1f} ms/step  final_n={final_n}",
                  flush=True)
            n *= 2


if __name__ == "__main__":
    main()
