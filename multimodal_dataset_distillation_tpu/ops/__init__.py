from multimodal_dataset_distillation_tpu.ops.contrastive import (  # noqa: F401
    FIXED_LOGIT_SCALE,
    RAW_LOG_SCALE,
    contrastive_loss_and_acc,
    info_nce,
    l2_normalize,
)
