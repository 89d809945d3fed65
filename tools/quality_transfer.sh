#!/usr/bin/env bash
# Table-D transfer-eval rehearsal (offline scale; VERDICT r3 item 6).
#
# Distills a tiny synthetic-dataset set with one image tower, then
# evaluates the SAME saved distilled npz under several eval towers — the
# mechanics of the paper's Table D backbone-pair transfer
# (distill_original.py:222 eval_stage / utils.py:336-360 eval pools):
# distilled images are raw pixels, the eval model's text projection is
# trained from scratch on the synthetic set, so the eval tower is a free
# choice at evaluation time.
#
# Hyperparameters are the PROVEN stable recipe from QUALITY.md's
# end-to-end record (256 concept-grounded pairs, convnet tower — run at 32² here (64² convnet is ~2 min/outer-iter on this 1-core host),
# lr_img=lr_txt=10, lr_lr=1e-6, syn_steps=4, expert_epochs=2, 300 outer
# iterations) — the first draft of this script used lr_img=100/lr_lr=1e-2,
# which is QUALITY.md's documented divergence mode, and reproduced it
# (NaN bailout at iter ~70; kept here as the record of why these values).
#
# Run on the 1-core CPU host (~40 min):
#   PYTHONPATH= JAX_PLATFORMS=cpu bash tools/quality_transfer.sh
# Results print as "Mean/..." rows per tower; recorded in QUALITY.md
# (Table E).

set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${WORK:-/tmp/quality_transfer}
rm -rf "$WORK" && mkdir -p "$WORK"
cd "$WORK"

COMMON="--dataset=synthetic --text_encoder=bert --text_encoder_config=tiny \
  --image_size=32 --synthetic_size=256 --synthetic_test_size=32 \
  --batch_size_test=32 --disable_wandb True"

echo "== phase 1: expert buffers (convnet) =="
python /root/repo/buffer.py $COMMON --image_encoder=convnet \
  --num_experts=3 --train_epochs=8 --batch_size_train=32 \
  --buffer_path=./buffers --lr_teacher_img=0.1 --lr_teacher_txt=0.1

echo "== phase 2: distill (convnet students, QUALITY.md recipe) =="
python /root/repo/distill.py $COMMON --image_encoder=convnet \
  --num_queries=16 --mini_batch_size=16 --syn_steps=4 --expert_epochs=2 \
  --max_start_epoch=6 --Iteration=300 --eval_it=300 --num_eval=1 \
  --epoch_eval_train=4 --batch_train=16 \
  --buffer_path=./buffers/synthetic/convnet/bert \
  --save_dir=./logged_files --draw True \
  --lr_img=10 --lr_txt=10 --lr_lr=1e-6

NPZ=$(ls ./logged_files/synthetic/*/distilled_300.npz | head -1)
echo "== distilled set: $NPZ =="

for TOWER in convnet nf_tiny resnet18_gn; do
  echo "== transfer eval tower: $TOWER =="
  python /root/repo/eval_distilled.py $COMMON --image_encoder=$TOWER \
    --distilled_npz="$NPZ" --num_eval=3 --epoch_eval_train=4 \
    --batch_train=16 --std True --parallel_eval False
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
for TOWER in convnet nf_tiny resnet18_gn; do
  echo "== control eval tower: $TOWER =="
  python /root/repo/eval_distilled.py $COMMON --image_encoder=$TOWER \
    --distilled_npz=./random_control.npz --num_eval=3 --epoch_eval_train=4 \
    --batch_train=16 --std True --parallel_eval False
done
