#!/usr/bin/env bash
# BASELINE config #4 rehearsal (VERDICT r4 next #4): the ROCO CSV path —
# buffer_roco.py (the Buffer_ROCO_Test.py drop-in) -> distill -> eval —
# driven end-to-end over an offline fixture in the EXACT reference
# format (id,name,caption CSV, /root/reference/rocov2Radiology_dataset.py
# :30-42), including one corrupt JPEG and one missing file so the
# black-image fallback (:60-68) runs inside a real training job.
#
# Images are concept-grounded (color/shape/background captions) so the
# retrieval metrics have learnable signal; hyperparameters are the
# QUALITY.md proven stable recipe (convnet tower @32², lr_img=lr_txt=10,
# lr_lr=1e-6).  Distilled set is scored against (a) its own iter-0
# init and (b) a random-pixel control.
#
# Run on the 1-core CPU host (~45 min):
#   PYTHONPATH= JAX_PLATFORMS=cpu bash tools/quality_roco.sh
# Results recorded in QUALITY.md ("ROCO rehearsal").

set -euo pipefail
cd "$(dirname "$0")/.."
REPO=$(pwd)
WORK=${WORK:-/tmp/quality_roco}
rm -rf "$WORK" && mkdir -p "$WORK"

python "$REPO/tools/make_fixtures.py" roco "$WORK/fixture" 256
cd "$WORK"

COMMON="--dataset=roco --image_root=$WORK/fixture/images \
  --ann_root=$WORK/fixture/radiologytraindata.csv \
  --text_encoder=bert --text_encoder_config=tiny --image_size=32 \
  --batch_size_test=32 --disable_wandb True"

echo "== phase 1: ROCO expert buffers (buffer_roco.py, convnet tower) =="
python "$REPO/buffer_roco.py" $COMMON --image_encoder=convnet \
  --num_experts=3 --train_epochs=${TEPOCHS:-8} --batch_size_train=32 \
  --buffer_path=./buffers --lr_teacher_img=0.1 --lr_teacher_txt=0.1

echo "== phase 2: distill on the ROCO loader =="
python "$REPO/distill.py" $COMMON --image_encoder=convnet \
  --num_queries=16 --mini_batch_size=16 --syn_steps=4 --expert_epochs=2 \
  --max_start_epoch=${MSE:-6} --Iteration=${ITERS:-300} --eval_it=${ITERS:-300} --num_eval=1 \
  --epoch_eval_train=4 --batch_train=16 \
  --buffer_path=./buffers/roco/convnet/bert \
  --save_dir=./logged_files --draw True \
  --lr_img=10 --lr_txt=10 --lr_lr=1e-6

NPZ=$(ls ./logged_files/roco/*/distilled_${ITERS:-300}.npz | head -1)
INIT=$(ls ./logged_files/roco/*/distilled_0.npz | head -1)
echo "== distilled: $NPZ  init: $INIT =="

python - "$NPZ" <<'EOF'
import sys, numpy as np
z = np.load(sys.argv[1])
rng = np.random.RandomState(0)
np.savez("random_control.npz",
         image_syn=rng.randn(*z["image_syn"].shape).astype(np.float32),
         text_syn=rng.randn(*z["text_syn"].shape).astype(np.float32),
         syn_lr_img=z["syn_lr_img"], syn_lr_txt=z["syn_lr_txt"])
EOF

for SET in "$NPZ" "$INIT" ./random_control.npz; do
  echo "== eval: $SET =="
  python "$REPO/eval_distilled.py" $COMMON --image_encoder=convnet \
    --distilled_npz="$SET" --num_eval=${NEVAL:-3} --epoch_eval_train=${EEPOCHS:-4} \
    --batch_train=16 --std True --parallel_eval False
done
echo "== done; artifacts in $WORK =="
