"""Kernel-tile sweep: the TPU analog of the reference's block-size axis.

The reference sweeps CUDA block size {128, 256, 512, 1024}
(/root/reference/src/test.cu:8); the fused Mosaic engines' counterpart is
``kernel_sublanes`` (tile = sublanes x 128 lanes).  This records the A/B
that chose the default (config.py: 128) as an automated artifact:
kernel_sublanes in {32, 64, 128, 256} x T in {10, 100, 1000} for both
fused engines at the bench point (1M electrons, 256^3 grid, 10 Poisson
steps to mirror the canonical sweep's step count).

    python scripts/tile_sweep.py [out_csv]

CSV schema mirrors the canonical sweep with block_size carrying the
sublane count (the reference writes block size in the same column,
src/utility.cu:88-92).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = sys.argv[1] if len(sys.argv) > 1 else "out/data/kernel_tile_sweep.csv"

from particle_simulation_tpu import SimConfig
from particle_simulation_tpu.benchmarks import estimate_pushes
from particle_simulation_tpu.observability import CSV_HEADER
from particle_simulation_tpu.runtime import run_pic_device


def main():
    os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)
    new = not os.path.exists(OUT)
    f = open(OUT, "a")
    if new:
        f.write(CSV_HEADER + "\n")
    done = set()
    if not new:
        with open(OUT) as g:
            for line in g.readlines()[1:]:
                p = line.split(",")
                done.add((p[0], int(p[4]), int(p[3])))

    for sched, fname in (("dynamic", "Dynamic"), ("dynamic_old", "Dynamic Old")):
        for sublanes in (32, 64, 128, 256):
            hint = 0
            for t_steps in (10, 100, 1000):
                if (fname, sublanes, t_steps) in done:
                    continue
                # The staged engine's long-T rows cost many device-minutes
                # per tile at honest capacity (canonical T=700 took 910 s);
                # cap it at T=100, as the reference caps Naive at its
                # shared-mem limit (src/test.cu:23).
                if sched == "dynamic_old" and t_steps > 100:
                    continue
                cfg = SimConfig(
                    init_n=1_000_000,
                    # 8M: enough intra-step headroom that no engine hits the
                    # accept-drops-at-capacity path (run_pic_device) — the
                    # first recording used 2M and the avalanche transients
                    # clipped both engines' populations (worst: dyn_old
                    # T=1000 final_n 35906), making tiles incomparable.
                    capacity=8_000_000,
                    poisson_steps=10,
                    poisson_timestep=t_steps,
                    grid_size=(256, 256, 256),
                    scheduler=sched,
                    kernel_sublanes=sublanes,
                    block_size=sublanes,   # recorded in the block column
                    # pin the draw protocol: resumed rows must share
                    # provenance even across future default flips
                    rng_mode="block2",
                    worklog_unroll=2,
                )
                try:
                    # warm once per (engine, tile): T is a traced scalar, so
                    # one compile serves all T
                    warm = run_pic_device(cfg.replace(poisson_steps=1),
                                          w_start=hint)
                    hint = max(hint, warm.last_bucket)
                    t0 = time.perf_counter()
                    run = run_pic_device(cfg, w_start=hint)
                    wall = time.perf_counter() - t0
                    hint = max(hint, run.last_bucket)
                except Exception as e:       # noqa: BLE001 — record and move on
                    print(f"{sched} sublanes={sublanes} T={t_steps}: "
                          f"FAILED {type(e).__name__}: {e}", flush=True)
                    continue
                if any(s.overflow for s in run.steps):
                    print(
                        f"{sched} sublanes={sublanes} T={t_steps}: OVERFLOW "
                        f"at capacity — row not recorded (raise capacity)",
                        flush=True,
                    )
                    continue
                pushes = estimate_pushes(run)
                rate = pushes / max(run.device_time_ms / 1e3, 1e-9)
                print(
                    f"{sched:12s} sublanes={sublanes:4d} T={t_steps:5d} "
                    f"device={run.device_time_ms:9.1f} ms wall={wall:5.1f} s "
                    f"pushes/s={rate:.3e}",
                    flush=True,
                )
                f.write(
                    f"{fname},{cfg.init_n},{cfg.poisson_steps},"
                    f"{cfg.poisson_timestep},{sublanes},0,0,{run.final_n},"
                    f"{run.device_time_ms}\n"
                )
                f.flush()
    f.close()


if __name__ == "__main__":
    main()
