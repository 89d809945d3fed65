from multimodal_dataset_distillation_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    get_mesh,
    replicated_sharding,
    shard_batch,
)
