"""epoch_test must not retrace/recompile the image tower per call.

Round-1 regression: ``encode = jax.jit(lambda ...)`` inside ``epoch_test``
recompiled the full image encoder on every call (every expert epoch, every
synset eval).  Reference context: ``epoch_original.py:68-111`` runs this
path once per epoch per expert — with NFNet-L0 on v5e the retrace cost
minutes of wasted compile per eval.
"""

import numpy as np

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.engine import eval as eval_mod
from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder


def _tiny_model():
    return VLBiEncoder(image_encoder_name="convnet_tiny",
                       text_embedding=768, image_embedding=64)


def test_epoch_test_no_retrace():
    cfg = Config(image_encoder="convnet_tiny", image_size=16)
    model = _tiny_model()
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    imgs = rng.randn(8, 16, 16, 3).astype(np.float32)
    loader = [(imgs[:4], np.arange(4)), (imgs[4:], np.arange(4, 8))]
    bert = rng.randn(10, 768).astype(np.float32)

    eval_mod.epoch_test(loader, model, variables, bert, k_test=4)
    n_traces = eval_mod._encode_image._cache_size()
    assert n_traces >= 1

    # second call: cache hit, no new trace
    eval_mod.epoch_test(loader, model, variables, bert, k_test=4)
    assert eval_mod._encode_image._cache_size() == n_traces

    # a *fresh but equal* model instance (fresh nets per eval, the
    # evaluate_synset pattern) must also hit the cache: flax modules
    # hash by field values, not identity
    model2 = _tiny_model()
    variables2 = init_bi_encoder(model2, cfg)
    eval_mod.epoch_test(loader, model2, variables2, bert, k_test=4)
    assert eval_mod._encode_image._cache_size() == n_traces
