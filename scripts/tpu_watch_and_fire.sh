#!/bin/bash
# Watch the axon TPU tunnel; when it grants devices, run the round-3
# measurement battery once and exit. Probe is bounded (the tunnel hangs
# rather than erroring when down — see memory: axon-tunnel-flakiness).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watch.log
echo "watcher start $(date -u)" >> "$LOG"
while true; do
  if timeout 300 python -c "import jax; assert jax.devices()[0].platform != 'cpu'; print('up')" >> "$LOG" 2>&1; then
    echo "tunnel up $(date -u)" >> "$LOG"
    date -u > /tmp/tpu_up.txt
    bash scripts/tpu_battery.sh >> "$LOG" 2>&1
    echo "battery done rc=$? $(date -u)" >> "$LOG"
    exit 0
  fi
  echo "down $(date -u)" >> "$LOG"
  sleep 600
done
