#!/bin/bash
# Round-4 sequential TPU measurement queue (one TPU process at a time so
# numbers aren't polluted by device contention).
set -u
cd "$(dirname "$0")/.."
log=/tmp/r4_queue.log
{
  echo "== queue start $(date) =="
  # wait out any live ab_combo run
  while pgrep -f "scripts/ab_combo.py" > /dev/null 2>&1; do sleep 20; done
  echo "== smallbatch $(date) =="
  timeout 1500 python scripts/ab_smallbatch.py 404
  echo "== bench_driver $(date) =="
  timeout 3000 python scripts/bench_driver.py 64 404 640
  echo "== profile 640 $(date) =="
  timeout 1200 python scripts/profile_trace.py 640 5
  PARSE_ONLY=1 PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    timeout 600 python scripts/profile_trace.py 640 5
  echo "== queue done $(date) =="
} >> "$log" 2>&1
