"""CLIP text/vision towers (networks.py:659-661,700-702,728-731).

Checks: EOT pooling picks the right token, shapes, determinism of the
frozen encoder, integration with make_text_encoder and the bi-encoder.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.models.clip_text import (
    CLIP_TEXT_TINY,
    ClipHashingTokenizer,
    ClipTextEncoder,
    ClipTextTransformer,
)


def test_clip_tokenizer_eot_layout():
    tk = ClipHashingTokenizer(vocab_size=512, context_length=16)
    ids = tk(["a cat", "a very long caption " * 10])
    assert ids.shape == (2, 16)
    # EOT must be the max id in every row (argmax pooling lands on it)
    assert (ids.max(axis=1) == 511).all()
    # SOT first
    assert (ids[:, 0] == 510).all()


def test_clip_text_encoder_shapes_and_determinism():
    enc = ClipTextEncoder(variant="tiny", pretrained=False, seed=0)
    a = enc.encode(["a dog in a park", "two people talking"])
    b = enc.encode(["a dog in a park", "two people talking"])
    assert a.shape == (2, CLIP_TEXT_TINY.embed_dim)
    np.testing.assert_array_equal(a, b)
    # distinct captions -> distinct embeddings
    assert not np.allclose(a[0], a[1])


def test_eot_pooling_position_invariance():
    """Padding after EOT must not change the pooled embedding."""
    cfg = CLIP_TEXT_TINY
    m = ClipTextTransformer(cfg)
    ids = np.zeros((1, 10), np.int32)
    ids[0, :4] = [cfg.vocab_size - 2, 5, 7, cfg.vocab_size - 1]
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    out1 = m.apply(v, jnp.asarray(ids))
    # same tokens, longer zero padding (zeros attend causally but EOT at
    # index 3 only sees indices <= 3, so its representation is unchanged)
    ids2 = np.zeros((1, 14), np.int32)
    ids2[0, :4] = ids[0, :4]
    out2 = m.apply(v, jnp.asarray(ids2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def test_make_text_encoder_clip():
    from multimodal_dataset_distillation_tpu.data.textcache import (
        make_text_encoder,
    )

    cfg = Config(text_encoder="clip", text_encoder_config="tiny",
                 text_pretrained=False)
    enc = make_text_encoder(cfg)
    out = enc(["hello world"])
    assert out.shape == (1, CLIP_TEXT_TINY.embed_dim)
    assert cfg.text_embedding == 512  # base CLIP dim (networks.py:821-822)


def test_clip_vision_tower_shape():
    from multimodal_dataset_distillation_tpu.models.clip_vision import (
        ClipVisionConfig,
        ClipVisionTransformer,
    )

    cfg = ClipVisionConfig(image_size=64, patch_size=32, width=64,
                           num_layers=2, num_heads=2, embed_dim=32)
    m = ClipVisionTransformer(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 32)


def test_bi_encoder_with_clip_text():
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        build_bi_encoder,
    )

    cfg = Config(image_encoder="convnet_tiny", text_encoder="clip",
                 text_encoder_config="tiny", image_size=16)
    model = build_bi_encoder(cfg)
    assert model.text_embedding == CLIP_TEXT_TINY.embed_dim
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randn(4, 16, 16, 3), jnp.float32)
    txts = jnp.asarray(rng.randn(4, CLIP_TEXT_TINY.embed_dim), jnp.float32)
    loss, acc = model.apply(variables, imgs, txts, train=False)
    assert np.isfinite(float(loss))
