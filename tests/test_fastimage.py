"""Native JPEG decode pipeline vs PIL reference.

Builds the C++ library with g++ at first use; skips cleanly when the
toolchain is unavailable.
"""

import io

import numpy as np
import pytest
from PIL import Image

from multimodal_dataset_distillation_tpu.native import (
    decode_batch,
    get_fastimage,
    is_jpeg,
    read_dims,
)

pytestmark = pytest.mark.skipif(get_fastimage() is None,
                                reason="no native toolchain")


def _jpeg(w=320, h=240, seed=0, quality=95):
    rng = np.random.RandomState(seed)
    # low-frequency content so JPEG loss stays small
    small = rng.randint(0, 255, (6, 8, 3), np.uint8)
    img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
    buf = io.BytesIO()
    img.save(buf, format="JPEG", quality=quality)
    return buf.getvalue(), img


def test_read_dims():
    data, _ = _jpeg(321, 243)
    assert is_jpeg(data)
    assert read_dims(data) == (321, 243)
    assert read_dims(b"not a jpeg") is None


def test_decode_matches_pil():
    data, img = _jpeg(320, 240, seed=1)
    crop = (40, 30, 200, 160)
    out, failed = decode_batch([(data, crop, False)], out_size=64)
    assert not failed
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB")
        .resize((64, 64), Image.BILINEAR,
                box=(crop[0], crop[1], crop[0] + crop[2], crop[1] + crop[3])),
        np.float32)
    got = out[0].astype(np.float32)
    # bilinear conventions differ slightly at borders; compare loosely
    assert np.mean(np.abs(got - ref)) < 8.0
    assert np.corrcoef(got.ravel(), ref.ravel())[0, 1] > 0.98


def test_hflip():
    data, _ = _jpeg(128, 128, seed=2)
    a, _ = decode_batch([(data, (0, 0, 128, 128), False)], 32)
    b, _ = decode_batch([(data, (0, 0, 128, 128), True)], 32)
    np.testing.assert_allclose(a[0], b[0][:, ::-1], atol=1)


def test_batch_threads_and_failures():
    datas = [_jpeg(160, 120, seed=s)[0] for s in range(6)]
    items = [(d, (0, 0, 160, 120), False) for d in datas]
    items.insert(3, (b"corrupt bytes here", (0, 0, 10, 10), False))
    out, failed = decode_batch(items, 48, n_threads=4)
    assert out.shape == (7, 48, 48, 3)
    assert failed == [3]
    for i in [0, 1, 2, 4, 5, 6]:
        assert out[i].any()
    # single-thread equals multi-thread
    out1, _ = decode_batch(items, 48, n_threads=1)
    np.testing.assert_array_equal(out, out1)


def test_dct_scaling_large_image():
    """Large source, small crop target: DCT-scaled decode stays accurate."""
    data, img = _jpeg(1600, 1200, seed=3)
    out, failed = decode_batch([(data, (200, 100, 1200, 1000), False)], 224)
    assert not failed
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB")
        .resize((224, 224), Image.BILINEAR, box=(200, 100, 1400, 1100)),
        np.float32)
    assert np.corrcoef(out[0].astype(np.float32).ravel(),
                       ref.ravel())[0, 1] > 0.97


def test_native_train_transform_pipeline(tmp_path):
    """End-to-end: JSON dataset -> bytes fast path -> normalized batch,
    including a PNG (non-JPEG) fallback image."""
    import json
    import os

    from multimodal_dataset_distillation_tpu.data.datasets import JsonVLTrain
    from multimodal_dataset_distillation_tpu.data.transforms import (
        make_train_transform_native,
    )

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    anns = []
    for i in range(3):
        name = f"im{i}.jpg" if i < 2 else "im2.png"
        _, img = _jpeg(200, 150, seed=i)
        img.save(img_dir / name)
        anns.append({"image": name, "caption": f"a photo number {i}",
                     "image_id": str(i)})
    ann_file = tmp_path / "train.json"
    ann_file.write_text(json.dumps(anns))

    t = make_train_transform_native(image_size=64)
    ds = JsonVLTrain(str(ann_file), str(img_dir), t)
    for i in range(3):
        arr, caption, img_id = ds[i]
        assert arr.shape == (64, 64, 3)
        assert arr.dtype == np.float32
        assert np.isfinite(arr).all()
