from multimodal_dataset_distillation_tpu.models.projection import ProjectionHead  # noqa: F401
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder  # noqa: F401
from multimodal_dataset_distillation_tpu.models.zoo import (  # noqa: F401
    create_image_encoder,
    get_network,
    IMAGE_FEATURE_DIMS,
)
