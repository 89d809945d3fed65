#!/bin/sh
# Sequential XLA:TPU scheduler-knob sweep (see tools/bench_sched.py).
# Each variant pays a full remote compile (~25 min on the axon tunnel:
# remote-compiled executables are not persisted by jax's compile cache),
# so the sweep runs serially in the background and appends one JSON line
# per variant to $OUT (default /tmp/sched_sweep.jsonl).
set -u
cd "$(dirname "$0")/.."
OUT=${OUT:-/tmp/sched_sweep.jsonl}
for opts in \
  '{"xla_tpu_scheduler_percent_shared_memory_limit": "90"}' \
  '{"xla_tpu_scheduler_percent_shared_memory_limit": "75"}' \
  '{"xla_tpu_scheduler_percent_shared_memory_limit": "60"}' \
  '{"xla_tpu_enable_latency_hiding_scheduler": "false"}' \
  '{"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"}' \
; do
  echo "=== $(date -u +%H:%M:%S) running: $opts" >&2
  SCHED_OPTS="$opts" ITERS=8 timeout 3600 python tools/bench_sched.py \
    >> "$OUT" 2>/tmp/sched_variant.err || \
    echo "{\"opts\": $opts, \"error\": \"rc=$? (timeout/crash)\"}" >> "$OUT"
done
echo "sweep done" >&2
