#!/bin/bash
# Retry loop around sweep_fill_r3.py: the TPU worker faults intermittently
# on long single dispatches (STATUS.md); each retry resumes from the CSV +
# persisted bucket hints.  Usage: sweep_fill_r3.sh [total_budget_s] [tries]
BUDGET=${1:-14000}
TRIES=${2:-12}
cd "$(dirname "$0")/.."
DEADLINE=$(($(date +%s) + ${BUDGET%.*}))
for i in $(seq "$TRIES"); do
    LEFT=$((DEADLINE - $(date +%s)))
    if [ "$LEFT" -le 60 ]; then echo "budget exhausted"; break; fi
    echo "=== attempt $i  left=${LEFT}s  $(date) ==="
    python scripts/sweep_fill_r3.py "$LEFT" && break
    echo "--- attempt $i crashed (rc=$?); retrying in 20 s ---"
    sleep 20
done
