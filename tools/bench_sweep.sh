#!/bin/bash
# Sequential single-chip perf sweep: one config per process (co-resident
# buffers contaminate measurements — round-1 finding). Appends to the log.
#
# Round-2 results at the headline config on v5e-1 (DESIGN.md §10):
#   default (forward-HVP, flat carry, unroll=8)  0.856 steps/s  <- best
#   forward unroll=4 / unroll=1                  0.778 / 0.747
#   forward + tree carry unroll=1 / 2            0.830 / 0.824 (u8 OOM)
#   reverse + per-step remat unroll=8            0.776-0.778
#   reverse + dots_no_batch                      0.786
#   reverse + dots, noremat, prevent_cse=0       OOM
cd /root/repo
LOG=${1:-/tmp/bench_sweep.log}
run() {
  name=$1; shift
  echo "=== $name [$*] $(date +%H:%M:%S)" >> "$LOG"
  env "$@" timeout 2400 python bench.py >> "$LOG" 2>&1
  echo "--- rc=$? $(date +%H:%M:%S)" >> "$LOG"
}
run default      BENCH_DUMMY=1
run fwd_u4       BENCH_SCAN_UNROLL=4
run fwd_u1       BENCH_SCAN_UNROLL=1
run tree_u1      BENCH_CARRY_MODE=tree BENCH_SCAN_UNROLL=1
run tree_u2      BENCH_CARRY_MODE=tree BENCH_SCAN_UNROLL=2
run rev_remat    BENCH_HVP_MODE=reverse
run rev_dnb      BENCH_HVP_MODE=reverse BENCH_REMAT_POLICY=dots_no_batch
echo "SWEEP DONE" >> "$LOG"
