#!/bin/bash
# Production-length flagship soak: NFNet-L0 @ 224², nq=100, syn_steps=8,
# mb=100 — 2000 outer iterations against a SIX-expert buffer, so the
# trajectory rotation overflows the 4-slot device cache every cycle and
# the --traj_prefetch overlap path runs for real.
#
# Phase 0 A/Bs AB_ITERS iters with prefetch off/on at equal state to
# record the rotation-miss stall it hides; phase 2 is the long soak.
#
# RUN RECORD (round 5, v5e-1 behind the axon tunnel — QUALITY.md):
# every rotation miss re-uploads a ~715 MB trajectory at ~25 MB/s, so
# the miss costs ~30-40 s and the A/B measured OFF 39.7 s/step vs ON
# 17.8 s/step (2.23x, bit-identical losses).  On such a tunnel host a
# 2000-iter 6-expert rotation is transfer-bound (~17 h) — phase 2
# therefore runs with SOAK_MAX_FILES=3 cache-resident experts (the
# production regime; set SOAK_MAX_FILES= empty on a PCIe-local TPU-VM
# to soak the full rotation).  AB_ITERS=15 was used for the same
# reason (60 iters x 40 s exceeded the phase timeout).
# Runtime on v5e-1: buffer ~40 min, A/B 2x(compile+AB_ITERS*step),
# soak ~90 min.  Run solo on the chip.
set -e
OUT=${1:-/tmp/quality_soak2000}
mkdir -p "$OUT" && cd "$OUT"

COMMON="--dataset=synthetic --image_encoder=nfnet --text_encoder=bert \
  --text_encoder_config=tiny --image_size=224 --synthetic_size=512 \
  --synthetic_test_size=64"

echo "=== phase 1: 6 expert trajectories (NFNet-L0 @ 224, synthetic) ==="
timeout 5400 python /root/repo/buffer.py $COMMON \
  --num_experts=6 --train_epochs=4 \
  --batch_size_train=64 --batch_size_test=64 --buffer_path=./buffers \
  --lr_teacher_img=0.05 --lr_teacher_txt=0.05 --train_dtype=bfloat16

DISTILL="$COMMON --num_queries=100 --mini_batch_size=100 \
  --syn_steps=8 --expert_epochs=1 --max_start_epoch=3 \
  --batch_train=50 --batch_size_test=64 \
  --buffer_path=./buffers/synthetic/nfnet/bert \
  --lr_img=100 --lr_txt=100 --lr_lr=1e-5 \
  --lr_teacher_img=0.1 --lr_teacher_txt=0.1 --inner_dtype=bfloat16 \
  --scan_unroll=2 --hvp_mode=forward --std True"
# Outer LRs are the QUALITY.md values (see quality_nfnet.sh's note on
# why the paper's Flickr LRs diverge on this offline landscape).

AB_ITERS=${AB_ITERS:-15}
echo "=== phase 0a: ${AB_ITERS}-iter rotation A/B, prefetch OFF ==="
timeout 3600 python /root/repo/distill.py $DISTILL \
  --Iteration=$AB_ITERS --eval_it=10000 --num_eval=0 \
  --save_dir=./ab_off --traj_prefetch False

echo "=== phase 0b: ${AB_ITERS}-iter rotation A/B, prefetch ON ==="
timeout 3600 python /root/repo/distill.py $DISTILL \
  --Iteration=$AB_ITERS --eval_it=10000 --num_eval=0 \
  --save_dir=./ab_on --traj_prefetch True

echo "=== phase 2: 2000-iteration soak (eval every 250) ==="
SOAK_FILES=${SOAK_MAX_FILES:-3}
timeout 14400 python /root/repo/distill.py $DISTILL \
  --Iteration=2000 --eval_it=250 --num_eval=2 --epoch_eval_train=4 \
  ${SOAK_FILES:+--max_files=$SOAK_FILES} \
  --save_dir=./logged_files

echo "=== done; artifacts in $OUT ==="
