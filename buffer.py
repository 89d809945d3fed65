#!/usr/bin/env python
"""Expert-trajectory training CLI — drop-in for the reference ``buffer.py``.

Usage (reference flags preserved):
    python buffer.py --dataset=flickr --image_encoder=nfnet \
        --num_experts=100 --train_epochs=50 --lr_teacher_img=0.1 ...
"""

from multimodal_dataset_distillation_tpu.cli.buffer import main
from multimodal_dataset_distillation_tpu.config import Config, parse_config

if __name__ == "__main__":
    main(parse_config(defaults=Config(image_encoder="nfnet")))
