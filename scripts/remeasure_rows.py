"""Re-measure specific canonical-sweep rows in a quiet window.

Deletes the named (scheduler, T) rows from the CSV, then runs the sweep
with resume=True so ONLY those rows are re-recorded (everything else is
skipped as already present).  Used when a row was recorded while the host
was contended — the single-core box serializes the sweep's dispatch loop
against any other process, which can inflate a host-dispatch-bound row
(the CPU Sync generation loop especially) several-fold.

Usage: python scripts/remeasure_rows.py sync:30 sync:50 [naive:300 ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particle_simulation_tpu.benchmarks import run_benchmark

NAME = {
    "dynamic": "Dynamic", "sync": "CPU Sync",
    "naive": "Naive", "dynamic_old": "Dynamic Old",
}

CSV = "out/data/mobility_timesteps_nodet.csv"

targets = []
for arg in sys.argv[1:]:
    sched, t = arg.split(":")
    targets.append((NAME[sched], int(t)))
if not targets:
    sys.exit("no rows given (scheduler:T ...)")

with open(CSV) as f:
    lines = f.readlines()
kept = []
for line in lines:
    parts = line.rstrip("\n").split(",")
    try:
        key = (parts[0], int(float(parts[3])))
    except (ValueError, IndexError):  # header or malformed line
        kept.append(line)
        continue
    if key in targets:
        print(f"dropping: {line.strip()}")
        continue
    kept.append(line)
with open(CSV, "w") as f:
    f.writelines(kept)

scheds = sorted({s for s, _ in [(a.split(":")[0], 0) for a in sys.argv[1:]]})
max_t = {}
for arg in sys.argv[1:]:
    sched, t = arg.split(":")
    max_t[sched] = max(max_t.get(sched, 0), int(t))

run_benchmark(
    profile="full",
    resume=True,
    only_schedulers=scheds,
    max_t=max_t,
)
