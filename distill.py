#!/usr/bin/env python
"""Bi-trajectory distillation CLI — drop-in for the reference
``distill.py`` / ``distill_original.py``.

Usage (reference flags preserved; BASELINE-pinned flags first-class):
    python distill.py --dataset=flickr --num_queries=100 --syn_steps=8 \
        --expert_epochs=1 --lr_img=1000 --lr_txt=1000 --lr_lr=1e-2 ...

Numerics: ``--inner_scale fixed`` (default) reproduces upstream
``distill_original.py`` (raw log(1/0.07) scale in the inner loss);
``--inner_scale syn_lr`` reproduces the fork's ``distill.py:548``.
"""

from multimodal_dataset_distillation_tpu.cli.distill import main
from multimodal_dataset_distillation_tpu.config import Config, parse_config

if __name__ == "__main__":
    main(parse_config(defaults=Config(image_encoder="nfnet")))
