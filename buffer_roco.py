#!/usr/bin/env python
"""ROCOv2 radiology expert trainer — drop-in for the reference
``Buffer_ROCO_Test.py`` (its standalone data plumbing is unified into the
shared data layer here; ``--disable_wandb`` honored, ``:160-168``).

Usage:
    python buffer_roco.py --dataset=roco \
        --image_root=/path/to/radiology/images/ \
        --ann_root=/path/to/radiologytraindata.csv ...
"""

from multimodal_dataset_distillation_tpu.cli.buffer import main
from multimodal_dataset_distillation_tpu.config import Config, parse_config

if __name__ == "__main__":
    main(parse_config(defaults=Config(dataset="roco", image_encoder="nfnet",
                                      disable_wandb=True)))
