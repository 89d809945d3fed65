#!/bin/bash
# Sequential single-chip perf sweep: one config per process (co-resident
# buffers contaminate measurements — round-1 finding). Appends to the log.
cd /root/repo
LOG=${1:-/tmp/bench_sweep.log}
run() {
  name=$1; shift
  echo "=== $name [$*] $(date +%H:%M:%S)" >> "$LOG"
  env "$@" timeout 2400 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run base        BENCH_DUMMY=1
run nocse       BENCH_PREVENT_CSE=0
run noremat     BENCH_REMAT=0
run dots_nocse  BENCH_REMAT_POLICY=dots BENCH_PREVENT_CSE=0
run dots        BENCH_REMAT_POLICY=dots
run group2_nocse BENCH_REMAT_GROUP=2 BENCH_PREVENT_CSE=0
echo "SWEEP DONE" >> "$LOG"
