#!/bin/bash
# Wait for the axon TPU backend to come back (bounded subprocess probes —
# a dead worker hangs a raw client ~25 min, a killed probe costs 150 s),
# then exec the given command.  Probe budget: 8 h.
#
#   scripts/wait_chip_then.sh <cmd...>
set -u
deadline=$(( $(date +%s) + 8 * 3600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
    if timeout 150 python -c \
        "import jax, jax.numpy as jnp; assert float(jnp.sum(jnp.arange(8.0))) == 28.0" \
        >/dev/null 2>&1; then
        echo "[wait_chip] backend healthy at $(date -u +%H:%M:%S)Z" >&2
        exec "$@"
    fi
    echo "[wait_chip] backend down at $(date -u +%H:%M:%S)Z; retry in 120 s" >&2
    sleep 120
done
echo "[wait_chip] gave up after 8 h" >&2
exit 1
