"""Fill the remaining canonical-sweep rows (reference src/test.cu:5-23):
CPU Sync T=30..100, Naive T=400..1000, Dynamic Old T=600..1000.

Rows are recorded cheapest-first ACROSS schedulers (interleaved passes) so
a time-budget or worker-fault truncation still leaves balanced coverage:
the sync oracle rows (VERDICT r2 #4) and the first tail rows land before
the multi-hour T=1000 naive points.

    python scripts/sweep_fill_r3.py [total_budget_s]

Resumable: recorded rows are skipped; bucket hints persist in
out/data/sweep_hints.json; run under scripts/sweep_fill_r3.sh so an
intermittent TPU worker fault (see STATUS.md) restarts the process.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particle_simulation_tpu.benchmarks import run_benchmark

TOTAL_BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 14000.0
t0 = time.perf_counter()

# (schedulers, max_t per scheduler) — cheapest rows first.  Sync (complete
# to T=100) and dynamic_old <= 700 already recorded; naive tails now run
# the chunked-dispatch path (benchmarks.py naive_chunk), which bounds each
# dispatch to ~100 mobility steps — the whole-phase dispatches faulted the
# worker 3-for-3 at T >= 400.
PASSES = [
    # Sync T=80: dropped by remeasure_rows.py as contended, never re-run
    # (resume=True skips the recorded T=10..100 rows, so only 80 executes).
    (["sync"], {"sync": 80}),
    (["naive"], {"naive": 500}),
    (["dynamic_old"], {"dynamic_old": 1000}),
    (["naive"], {"naive": 700}),
    (["naive"], {"naive": 1000}),
]

for only, max_t in PASSES:
    left = TOTAL_BUDGET - (time.perf_counter() - t0)
    if left <= 0:
        print("total budget exhausted", flush=True)
        break
    print(f"=== pass only={only} max_t={max_t} budget_left={left:.0f}s ===",
          flush=True)
    run_benchmark(
        profile="full",
        time_budget_s=left,
        resume=True,
        only_schedulers=only,
        max_t=max_t,
        # rows checkpoint per Poisson step now (run_pic_device row_ckpt), so
        # every crash-retry attempt makes monotonic progress — a T=1000 row
        # legitimately needs ~(row time / mean time between worker faults)
        # attempts, not 3
        poison_limit=10,
    )
print("sweep_fill_r3 done", flush=True)
