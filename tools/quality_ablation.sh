#!/bin/bash
# Ablation-surface rehearsal (round 3): the paper's two ablation axes —
# text encoder (Table B: BERT vs CLIP; /root/reference images/table.png)
# and vision encoder (Table C: NFNet-L0 / NF-ResNet50 / ViT-Tiny) —
# exercised END TO END (buffer -> distill -> fresh-model eval) at the
# flagship 224^2 scale on the offline synthetic dataset, on real TPU.
# QUALITY.md's flagship runs only ever used nfnet+bert; this validates
# that every ablation cell a reference user could run flows through the
# same code paths at scale (tiny-config towers, no pretrained weights,
# so absolute numbers are NOT the paper's — the claim is the axes work).
#
# Usage: tools/quality_ablation.sh <image_encoder> <text_encoder> [outdir]
# Runtime per cell on v5e-1: ~10 min buffer + ~20 min distill (compile
# dominated).  Run solo — never alongside bench.py (single chip).
set -e
IMG=${1:?image_encoder}
TXT=${2:?text_encoder}
OUT=${3:-/tmp/quality_ablation_${IMG}_${TXT}}
mkdir -p "$OUT" && cd "$OUT"

echo "=== cell ${IMG}+${TXT} phase 1: expert trajectory @224 ==="
timeout 3600 python /root/repo/buffer.py \
  --dataset=synthetic --image_encoder="$IMG" --text_encoder="$TXT" \
  --text_encoder_config=tiny --image_size=224 --synthetic_size=512 \
  --synthetic_test_size=64 --num_experts=1 --train_epochs=4 \
  --batch_size_train=64 --batch_size_test=64 --buffer_path=./buffers \
  --lr_teacher_img=0.05 --lr_teacher_txt=0.05 --train_dtype=bfloat16

echo "=== cell ${IMG}+${TXT} phase 2: distill 50 iters ==="
timeout 5400 python /root/repo/distill.py \
  --dataset=synthetic --image_encoder="$IMG" --text_encoder="$TXT" \
  --text_encoder_config=tiny --image_size=224 --synthetic_size=512 \
  --synthetic_test_size=64 --num_queries=100 --mini_batch_size=100 \
  --syn_steps=8 --expert_epochs=1 --max_start_epoch=3 --Iteration=50 \
  --eval_it=50 --num_eval=1 --epoch_eval_train=4 --batch_train=50 \
  --batch_size_test=64 --buffer_path="./buffers/synthetic/${IMG}/${TXT}" \
  --save_dir=./logged_files --lr_img=100 --lr_txt=100 --lr_lr=1e-5 \
  --lr_teacher_img=0.1 --lr_teacher_txt=0.1 --inner_dtype=bfloat16 \
  --scan_unroll=2 --hvp_mode=forward --std True
echo "=== cell ${IMG}+${TXT} done; artifacts in $OUT ==="
