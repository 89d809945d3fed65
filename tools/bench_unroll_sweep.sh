#!/bin/bash
# Partial-unroll sweep at the two scaled configs the headline's unroll
# tuning never covered (DESIGN §10 scaling table rows were measured at
# unroll=1 only):
#   - stress config (BASELINE #5): nq=500, syn_steps=20
#   - Table A largest row:         nq=1000, syn_steps=8
# The headline (nq=100, syn_steps=8) gains ~16% from full unroll
# interleaving; these configs were never swept because full unroll OOMs
# there — but partial unroll (2/4) may recover part of the interleave
# win within memory.  Run SOLO on the chip (1-core host: no concurrent
# heavy jobs).  Each variant pays a full compile (~20-40 min).
set -u
OUT=${1:-/tmp/unroll_sweep}
mkdir -p "$OUT"
cd /root/repo

run() {
  local tag=$1; shift
  echo "=== $tag ($(date +%H:%M)) ==="
  timeout 4200 env "$@" SKIP_EXPERT=1 ITERS=3 \
    python tools/bench_stress.py 2>&1 | tee "$OUT/$tag.log" | tail -3
}

run stress_u2 NQ=500 SYN_STEPS=20 UNROLL=2
run stress_u4 NQ=500 SYN_STEPS=20 UNROLL=4
run nq1000_u2 NQ=1000 SYN_STEPS=8 UNROLL=2
echo "=== sweep done ($(date +%H:%M)); logs in $OUT ==="
