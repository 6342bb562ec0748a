#!/bin/bash
# One-shot TPU measurement queue: run everything blocked on the tunnel in
# priority order the moment it recovers. Each step is bounded and logged so
# a short recovery window still yields data. Usage:
#   bash scripts/tpu_queue.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/tpu_queue.log}"
echo "== tpu_queue start $(date -u +%FT%TZ) ==" | tee -a "$LOG"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "-- $name ($(date -u +%T)) --" | tee -a "$LOG"
  timeout "$t" "$@" >>"$LOG" 2>&1
  echo "-- $name rc=$? --" | tee -a "$LOG"
}

# 0a. single-core host: timing runs are polluted by concurrent CPU-heavy
# jobs (e.g. the CPU parity control arm). Wait for the lock to clear,
# bounded at 2 h.
for i in $(seq 1 60); do
  [ -e /tmp/cpu_heavy.lock ] || break
  echo "cpu_heavy.lock held, waiting ($i)" | tee -a "$LOG"
  sleep 120
done

# 0. cheap liveness probe (fail fast if the tunnel is still wedged)
PROBE=$(timeout 120 python -c "import jax; d=jax.devices(); assert d; print('probe ok:', d)" 2>&1)
echo "$PROBE" | tee -a "$LOG"
echo "$PROBE" | grep -q "probe ok" || { echo "tunnel down, aborting" | tee -a "$LOG"; exit 1; }

# 1. fused plane gather in-step A/B (PERF.md row; fused is the new default)
run ab_fused 2400 python scripts/ab_fused.py 255 404 640

# 1b. fused line gather in-step A/B (decides fused_line_gather default)
run ab_line_fused 2400 python scripts/ab_line_fused.py 255 404 640

# 2. coarse march probe in-step A/B (decides occ_probe_ds default)
run ab_probe 3600 python scripts/ab_probe.py 404 640

# 3. binned-kernel (tile_rows, chunk) shape sweep (step-count-bound kernel)
run binned_shape 3600 python scripts/ab_binned_shape.py 404 640

# 4. fresh full bench (BENCH_r03 preview)
run bench 1200 python bench.py

# 5. fresh per-op trace at 640^3 (post-fused-gather breakdown for PERF.md)
run trace 1200 env PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/profile_trace.py 640 5

# 6. finish the precision bisect (no_topk, prec_only, f32_strict) — longest
# item (two full parity-scene trainings), so it runs after the perf sweeps
run bisect 10800 python scripts/parity_bisect.py /tmp/parity_ms 20211202

echo "== tpu_queue done $(date -u +%FT%TZ) ==" | tee -a "$LOG"
