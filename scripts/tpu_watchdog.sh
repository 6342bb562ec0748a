#!/bin/bash
# Tunnel-recovery watchdog: probe the TPU every ~4 min; the moment a probe
# succeeds, run the one-shot measurement queue (scripts/tpu_queue.sh) and
# exit. Bounded at ~10 h of probing. Designed to run detached:
#   setsid nohup bash scripts/tpu_watchdog.sh & echo $! > /tmp/tpu_watchdog.pid
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watchdog.log
QLOG=/tmp/tpu_queue.log
echo "== watchdog start $(date -u +%FT%TZ) pid=$$ ==" >>"$LOG"
for i in $(seq 1 150); do
  if timeout 120 python -c "import jax; d=jax.devices(); assert d and d[0].platform=='tpu'" >>"$LOG" 2>&1; then
    echo "== tunnel live at $(date -u +%FT%TZ), launching queue ==" >>"$LOG"
    bash scripts/tpu_queue.sh "$QLOG" >>"$LOG" 2>&1
    echo "== queue finished rc=$? $(date -u +%FT%TZ) ==" >>"$LOG"
    exit 0
  fi
  echo "probe $i failed $(date -u +%FT%TZ)" >>"$LOG"
  sleep 240
done
echo "== watchdog gave up $(date -u +%FT%TZ) ==" >>"$LOG"
exit 1
