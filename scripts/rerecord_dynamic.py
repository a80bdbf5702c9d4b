"""Re-record the canonical sweep's Dynamic column with the current engine.

Run after a worklog-engine perf change ships (round-3b: start-bucketed work
logs / guarded static lookup): the Dynamic rows in
out/data/mobility_timesteps_nodet.csv measure a specific engine build, so a
default-config change makes them stale.  This strips the Dynamic rows
(keeping every other scheduler's) and re-runs the full Dynamic column
T=10..1000 including the T in {100, 200} error-bar triplicates.

    python scripts/rerecord_dynamic.py [time_budget_s]
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particle_simulation_tpu.benchmarks import _DEFAULT_CSV, run_benchmark

budget = float(sys.argv[1]) if len(sys.argv) > 1 else 3600.0

if os.path.exists(_DEFAULT_CSV):
    with open(_DEFAULT_CSV) as f:
        lines = f.readlines()
    kept = [l for l in lines if not l.startswith("Dynamic,")]
    dropped = len(lines) - len(kept)
    with open(_DEFAULT_CSV, "w") as f:
        f.writelines(kept)
    print(f"dropped {dropped} Dynamic rows", flush=True)

# the worker faults intermittently on long dispatches (STATUS.md); the rows
# are stripped above, so a crash here without a retry leaves the Dynamic
# column partial — resume=True makes retries idempotent (done rows skip)
deadline = time.time() + budget
for attempt in range(8):
    left = deadline - time.time()
    if left <= 60:
        print("rerecord budget exhausted", flush=True)
        break
    try:
        run_benchmark(
            profile="full",
            time_budget_s=left,
            resume=True,
            only_schedulers=["dynamic"],
            repeat_map={("dynamic", 100): 3, ("dynamic", 200): 3},
        )
        break
    except Exception:  # noqa: BLE001 — worker fault; resume on retry
        traceback.print_exc()
        print(f"rerecord attempt {attempt + 1} crashed; retrying", flush=True)
        time.sleep(20)
print("rerecord_dynamic done", flush=True)
