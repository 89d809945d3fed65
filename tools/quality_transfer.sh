#!/usr/bin/env bash
# Table-D transfer-eval rehearsal (offline scale; VERDICT r3 item 6).
#
# Distills a tiny synthetic-dataset set with one image tower (nf_tiny),
# then evaluates the SAME saved distilled npz under several eval towers
# — the mechanics of the paper's Table D backbone-pair transfer
# (distill_original.py:222 eval_stage / utils.py:336-360 eval pools):
# distilled images are raw pixels, the eval model's text projection is
# trained from scratch on the synthetic set, so the eval tower is a
# free choice at evaluation time.
#
# Run on the 1-core CPU host:
#   PYTHONPATH= JAX_PLATFORMS=cpu bash tools/quality_transfer.sh
# Results are printed as "Evaluate_*" rows per tower; record them in
# QUALITY.md (Table E).

set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/tmp/quality_transfer}
rm -rf "$WORK" && mkdir -p "$WORK"
cd "$WORK"

COMMON="--dataset=synthetic --text_encoder=bert --text_encoder_config=tiny \
  --image_size=32 --synthetic_size=32 --synthetic_test_size=16 \
  --batch_size_test=16 --disable_wandb True"

echo "== phase 1: expert buffers (nf_tiny) =="
python /root/repo/buffer.py $COMMON --image_encoder=nf_tiny \
  --num_experts=2 --train_epochs=3 --batch_size_train=8 \
  --buffer_path=./buffers --lr_teacher_img=0.05 --lr_teacher_txt=0.05

echo "== phase 2: distill (nf_tiny students) =="
python /root/repo/distill.py $COMMON --image_encoder=nf_tiny \
  --num_queries=16 --mini_batch_size=8 --syn_steps=2 --expert_epochs=1 \
  --max_start_epoch=2 --Iteration=40 --eval_it=40 --num_eval=1 \
  --epoch_eval_train=2 --batch_train=8 \
  --buffer_path=./buffers/synthetic/nf_tiny/bert \
  --save_dir=./logged_files --draw True \
  --lr_img=100 --lr_txt=100 --lr_lr=0.01

NPZ=$(ls ./logged_files/synthetic/*/distilled_40.npz | head -1)
echo "== distilled set: $NPZ =="

for TOWER in nf_tiny convnet_tiny resnet18_gn; do
  echo "== transfer eval tower: $TOWER =="
  python /root/repo/eval_distilled.py $COMMON --image_encoder=$TOWER \
    --distilled_npz="$NPZ" --num_eval=3 --epoch_eval_train=3 \
    --batch_train=8 --std True --parallel_eval False
done

echo "== random-pixels control (same towers, untrained set) =="
python - "$NPZ" <<'EOF'
import sys, numpy as np
z = np.load(sys.argv[1])
rng = np.random.RandomState(0)
np.savez("random_control.npz",
         image_syn=rng.randn(*z["image_syn"].shape).astype(np.float32),
         text_syn=rng.randn(*z["text_syn"].shape).astype(np.float32),
         syn_lr_img=z["syn_lr_img"], syn_lr_txt=z["syn_lr_txt"])
EOF
for TOWER in nf_tiny convnet_tiny; do
  echo "== control eval tower: $TOWER =="
  python /root/repo/eval_distilled.py $COMMON --image_encoder=$TOWER \
    --distilled_npz=./random_control.npz --num_eval=3 --epoch_eval_train=3 \
    --batch_train=8 --std True --parallel_eval False
done
