#!/bin/bash
# Second round-4 TPU queue: wait out the parity-ours run, then measure the
# z/dist group gather in-step and refresh the 640^3 profile post-split.
set -u
cd "$(dirname "$0")/.."
log=/tmp/r4_queue2.log
{
  echo "== queue2 start $(date) =="
  while pgrep -f "localrf_tpu.train" > /dev/null 2>&1; do sleep 30; done
  echo "== ab default (post zdist-group + split) $(date) =="
  timeout 1200 python scripts/ab_combo.py --only default 404 640
  echo "== profile 640 post-split $(date) =="
  timeout 1200 python scripts/profile_trace.py 640 5
  PARSE_ONLY=1 PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    timeout 600 python scripts/profile_trace.py 640 5
  echo "== full bench $(date) =="
  timeout 2400 python bench.py
  echo "== queue2 done $(date) =="
} >> "$log" 2>&1
