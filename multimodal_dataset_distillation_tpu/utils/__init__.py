from multimodal_dataset_distillation_tpu.utils.flat import (  # noqa: F401
    flatten_params,
    make_unravel,
)
