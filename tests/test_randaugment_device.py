"""On-device RandAugment vs PIL reference (ops/randaugment_device.py)."""

import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

import jax
import jax.numpy as jnp

from multimodal_dataset_distillation_tpu.ops import randaugment_device as rd


def _img(seed=0, h=32, w=32):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3)).astype(np.float32)


def _pil(arr):
    return Image.fromarray(np.clip(arr, 0, 255).astype(np.uint8))


def test_autocontrast_matches_pil():
    a = _img(0)
    got = np.asarray(rd.autocontrast(jnp.asarray(a), 5.0, None))
    ref = np.asarray(ImageOps.autocontrast(_pil(a), cutoff=0), np.float32)
    assert np.mean(np.abs(got - ref)) < 1.0


def test_equalize_matches_pil():
    a = _img(1)
    got = np.asarray(rd.equalize(jnp.asarray(a), 5.0, None))
    ref = np.asarray(ImageOps.equalize(_pil(a)), np.float32)
    assert np.mean(np.abs(got - ref)) < 2.0


def test_solarize_matches_pil():
    a = _img(2)
    got = np.asarray(rd.solarize(jnp.asarray(a), 5.0, None))
    thresh = int(5 / 10 * 256)
    ref = np.asarray(ImageOps.solarize(_pil(a), threshold=thresh), np.float32)
    # boundary convention (>= vs >) differs by at most the threshold bin
    assert np.mean(np.abs(got - ref)) < 3.0


def test_posterize_matches_pil():
    a = _img(3)
    got = np.asarray(rd.posterize(jnp.asarray(a), 5.0, None))
    bits = max(int(5 / 10 * 4), 1)
    ref = np.asarray(ImageOps.posterize(_pil(a), bits), np.float32)
    np.testing.assert_allclose(got, ref, atol=1.0)


@pytest.mark.parametrize("name,factor_fn,pil_cls", [
    ("brightness", rd.brightness, ImageEnhance.Brightness),
    ("color", rd.color, ImageEnhance.Color),
    ("sharpness", rd.sharpness, ImageEnhance.Sharpness),
])
def test_enhance_matches_pil(name, factor_fn, pil_cls):
    a = _img(4)
    level = 5.0
    factor = level / 10 * 1.8 + 0.1
    got = np.asarray(factor_fn(jnp.asarray(a), level, None))
    ref = np.asarray(pil_cls(_pil(a)).enhance(factor), np.float32)
    assert np.mean(np.abs(got - ref)) < 4.0, name


def test_contrast_close_to_pil():
    a = _img(5)
    got = np.asarray(rd.contrast(jnp.asarray(a), 5.0, None))
    ref = np.asarray(ImageEnhance.Contrast(_pil(a)).enhance(5 / 10 * 1.8 + 0.1),
                     np.float32)
    assert np.mean(np.abs(got - ref)) < 4.0


def test_geometric_ops_shapes_and_fill():
    a = jnp.asarray(_img(6))
    key = jax.random.PRNGKey(0)
    for op in (rd.rotate, rd.shear_x, rd.shear_y, rd.translate_x,
               rd.translate_y):
        out = np.asarray(op(a, 9.0, key))
        assert out.shape == a.shape
        assert np.isfinite(out).all()
    # full-strength translate moves content and fills with 128
    out = np.asarray(rd.translate_x(a, 10.0, jax.random.PRNGKey(1)))
    assert (np.abs(out - 128.0) < 1.0).mean() > 0.05  # a fill band exists


def test_random_augment_device_batch():
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (4, 16, 16, 3)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    out = np.asarray(rd.random_augment_device(jnp.asarray(imgs), key))
    assert out.shape == imgs.shape
    assert np.isfinite(out).all()
    # deterministic under the same key
    out2 = np.asarray(rd.random_augment_device(jnp.asarray(imgs), key))
    np.testing.assert_array_equal(out, out2)
    # different key -> (almost surely) different augmentation
    out3 = np.asarray(rd.random_augment_device(
        jnp.asarray(imgs), jax.random.PRNGKey(7)))
    assert not np.array_equal(out, out3)


def test_device_augment_trainer_path():
    """--device_augment: raw [0,255] crops in, augment+normalize in-step."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.expert import (
        BiEncoderTrainer,
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )

    cfg = Config(image_encoder="convnet_tiny", image_size=16, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    t = BiEncoderTrainer(model, variables, lr_img=0.05, lr_txt=0.05, seed=0,
                         device_augment=True)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (8, 16, 16, 3)).astype(np.float32)
    texts = rng.randn(8, 768).astype(np.float32)
    loss, acc = t.train_batch(raw, texts)
    assert np.isfinite(float(loss))


def test_raw_transform_outputs_uint8_range(tmp_path):
    import io
    from PIL import Image as PILImage
    from multimodal_dataset_distillation_tpu.data.transforms import (
        make_train_transform_raw,
    )

    rng = np.random.RandomState(0)
    img = PILImage.fromarray(rng.randint(0, 256, (64, 80, 3), np.uint8))
    t = make_train_transform_raw(image_size=32)
    out = t(img)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    assert out.max() > 2.0  # raw scale, not normalized
    # bytes path (JPEG through the native decoder or PIL fallback)
    buf = io.BytesIO(); img.save(buf, format="JPEG")
    out2 = t(buf.getvalue())
    assert out2.shape == (32, 32, 3) and out2.max() > 2.0
