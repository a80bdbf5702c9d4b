#!/bin/bash
# Cooperative chip work queue: runs the given commands sequentially on the
# single-tenant TPU chip, publishing pid files so bench.py can preempt it
# (bench.py:_preempt_chip_queue writes /tmp/chip_queue_stop and SIGTERMs
# the published pids — pid FILES only, never pattern matching).
#
#   scripts/chip_queue.sh 'python scripts/sweep_fill_r3.sh 14000' ...
#
# Each argument is one phase, run in its own process group (setsid) whose
# pgid is published to /tmp/chip_queue_child.pid.  The stop sentinel is
# checked before every phase; phases are expected to be resumable, so a
# preempted phase can simply be re-queued later.
set -u
PID_FILE=/tmp/chip_queue.pid
CHILD_PID_FILE=/tmp/chip_queue_child.pid
STOP_FILE=/tmp/chip_queue_stop
LOG=${CHIP_QUEUE_LOG:-/tmp/chip_queue.log}

cd "$(dirname "$0")/.."
rm -f "$STOP_FILE"
echo $$ > "$PID_FILE"
trap 'rm -f "$PID_FILE" "$CHILD_PID_FILE"' EXIT

i=0
for phase in "$@"; do
    i=$((i + 1))
    if [ -e "$STOP_FILE" ]; then
        echo "=== stop sentinel present ($(cat "$STOP_FILE" 2>/dev/null)); \
aborting before phase $i ===" >> "$LOG"
        break
    fi
    echo "=== phase $i: $phase  ($(date)) ===" >> "$LOG"
    setsid bash -c "$phase" >> "$LOG" 2>&1 &
    child=$!
    echo "$child" > "$CHILD_PID_FILE"
    wait "$child"
    rc=$?
    echo "=== phase $i done rc=$rc ($(date)) ===" >> "$LOG"
    rm -f "$CHILD_PID_FILE"
done
echo "=== queue drained ($(date)) ===" >> "$LOG"
