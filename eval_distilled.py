#!/usr/bin/env python
"""Re-evaluate a saved distilled dataset (``distilled_{it}.npz``).

Capability beyond the reference: upstream never persists its distilled
tensors (distill_original.py:292-296 are commented out), so a finished
run can never be re-scored.  Our distill CLI saves them (+ the learned
inner LRs) at every eval; this replays the standard synset-evaluation
protocol (epoch_original.py:164-195) on any such file.

Usage:
    python eval_distilled.py --distilled_npz=logged_files/<...>/distilled_1000.npz \
        --dataset=flickr --image_encoder=nfnet --text_encoder=bert \
        --num_eval=5 --epoch_eval_train=4 --std True
"""

from multimodal_dataset_distillation_tpu.cli.eval_distilled import main
from multimodal_dataset_distillation_tpu.config import Config, parse_config

if __name__ == "__main__":
    main(parse_config(defaults=Config(image_encoder="nfnet")))
