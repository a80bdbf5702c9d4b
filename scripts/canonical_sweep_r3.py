"""Round-3 canonical sweep driver: fresh artifact with the bbox-subgrid
field phase (all rows same code provenance), error-bar repeats on the
headline points, sync oracle rows to T=100.

Reference config: src/test.cu:5-23 (init 1e6, cap 5e7, 10 Poisson steps,
T=10..1000, all four schedulers).

    python scripts/canonical_sweep_r3.py [budget_s]

Resumable: rerun after a worker crash; recorded rows are skipped.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from particle_simulation_tpu.benchmarks import run_benchmark

BUDGET = float(sys.argv[1]) if len(sys.argv) > 1 else 9000.0
RESUME = os.environ.get("SWEEP_RESUME", "0") == "1"

run_benchmark(
    profile="full",
    time_budget_s=BUDGET,
    resume=RESUME,
    # 3 measurements at the headline points -> seaborn error bands
    # (reference analyse/plot.py:36)
    repeat_map={
        ("dynamic", 100): 3, ("dynamic", 200): 3,
        ("naive", 100): 3, ("naive", 200): 3,
    },
    # the sync oracle's generation fixed point re-simulates whole ranges;
    # T=100 covers VERDICT r2 #4 (>= 10 oracle rows) without burning hours
    max_t={"sync": 100},
)
