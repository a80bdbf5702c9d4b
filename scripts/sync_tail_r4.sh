#!/bin/bash
# Record the CPU Sync canonical tail rows (VERDICT r3 #3) with the retry +
# row_ckpt machinery: the intermittent TPU worker fault (WORKER_FAULT.md)
# kills whole processes, but each retry resumes from the per-step snapshot
# so progress is monotonic.  Usage: sync_tail_r4.sh [max_t] [tries]
MAX_T=${1:-200}
TRIES=${2:-10}
cd "$(dirname "$0")/.."
for i in $(seq "$TRIES"); do
    echo "=== sync tail attempt $i  (max_t=$MAX_T)  $(date) ==="
    python -c "
from particle_simulation_tpu.benchmarks import run_benchmark
run_benchmark(profile='full', resume=True, only_schedulers=['sync'],
              max_t={'sync': $MAX_T}, poison_limit=$TRIES)
" && break
    echo "--- attempt $i crashed (rc=$?); retrying in 20 s ---"
    sleep 20
done
