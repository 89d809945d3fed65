"""Data layer: transforms, RandAugment ops, loaders, synthetic datasets, ZCA."""

import numpy as np
import pytest
from PIL import Image

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.data import create_dataset, get_dataset
from multimodal_dataset_distillation_tpu.data.pipeline import ArrayPairLoader, Loader
from multimodal_dataset_distillation_tpu.data.transforms import (
    CLIP_MEAN,
    CLIP_STD,
    denormalize,
    make_test_transform,
    make_train_transform,
    normalize,
)
from multimodal_dataset_distillation_tpu.ops.randaugment import OPS, RandomAugment, VL_AUGS
from multimodal_dataset_distillation_tpu.ops.zca import ZCAWhitening


def _img(size=40):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (size, size, 3), np.uint8))


def test_normalize_roundtrip():
    arr = np.random.RandomState(1).randint(0, 255, (8, 8, 3), np.uint8)
    n = normalize(arr)
    assert n.dtype == np.float32
    back = denormalize(n)
    np.testing.assert_allclose(back, arr.astype(np.float32), atol=0.01)


def test_train_transform_shape_and_range():
    t = make_train_transform(image_size=32)
    out = t(_img())
    assert out.shape == (32, 32, 3)
    # normalized: values in plausible CLIP-normalized range
    assert -3 < out.min() and out.max() < 4


def test_test_transform_deterministic():
    t = make_test_transform(image_size=24)
    a, b = t(_img()), t(_img())
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("op", sorted(OPS))
def test_randaugment_ops_preserve_shape(op):
    img = _img(32)
    out = OPS[op](img, 5)
    assert np.asarray(out).shape == (32, 32, 3)


def test_randaugment_sampling():
    np.random.seed(0)
    aug = RandomAugment(2, 5, isPIL=True, augs=VL_AUGS)
    ops = aug.get_random_ops()
    assert len(ops) == 2
    assert all(name in VL_AUGS and p == 0.5 and lvl == 5
               for name, p, lvl in ops)
    out = aug(_img(32))
    assert np.asarray(out).shape == (32, 32, 3)


def test_synthetic_dataset_and_loader():
    cfg = Config(dataset="synthetic", synthetic_size=20,
                 synthetic_test_size=6, image_size=16,
                 batch_size_train=8, batch_size_test=4, num_workers=2)
    train, val, test = create_dataset(cfg)
    assert len(train) == 20 and len(test) == 6
    img, cap, iid = train[0]
    assert img.shape == (16, 16, 3) and isinstance(cap, str)
    assert len(train.get_all_captions()) == 20
    # eval ground truth maps: 5 captions per image
    assert len(test.text) == 30
    assert test.img2txt[0] == [0, 1, 2, 3, 4]
    assert test.txt2img[7] == 1

    tl, el, tds, eds = get_dataset(cfg)
    batches = list(tl)
    assert len(batches) == 2  # drop_last: 20//8
    imgs, caps, ids = batches[0]
    assert imgs.shape == (8, 16, 16, 3)
    assert len(caps) == 8
    eb = list(el)
    assert eb[-1][0].shape[0] == 2  # 6 = 4 + 2, no drop


def test_array_pair_loader():
    imgs = np.zeros((10, 4, 4, 3), np.float32)
    txts = np.arange(10 * 2, dtype=np.float32).reshape(10, 2)
    loader = ArrayPairLoader(imgs, txts, batch_size=4, shuffle=True, seed=1)
    seen = []
    for bi, bt in loader:
        assert bi.shape[0] == bt.shape[0]
        seen.extend(bt[:, 0].tolist())
    assert sorted(seen) == sorted(txts[:, 0].tolist())


def test_zca_roundtrip():
    rng = np.random.RandomState(0)
    # more samples than features so the covariance is full-rank
    x = rng.randn(500, 4, 4, 3).astype(np.float32)
    z = ZCAWhitening(eps=0.01).fit(x)
    w = z.transform(x)
    back = z.inverse_transform(w)
    np.testing.assert_allclose(back, x, atol=1e-3)
    # whitened covariance ~ identity (eps-regularized)
    cov = np.cov(w.reshape(500, -1).T)
    assert abs(np.mean(np.diag(cov)) - 1.0) < 0.1
    off = cov - np.diag(np.diag(cov))
    assert np.abs(off).max() < 0.2


def test_get_images_texts_deterministic_and_single_fetch():
    """Seeded init must be bit-reproducible (the default path is
    sequential because the train transform consumes the GLOBAL np.random
    stream — a thread pool would consume it in scheduler order), and
    each item must be fetched exactly once (the reference indexes
    dataset[i] twice per pair, distill.py:97-105)."""
    from multimodal_dataset_distillation_tpu.data.datasets import (
        SyntheticVLTrain,
    )
    from multimodal_dataset_distillation_tpu.engine.distill import (
        get_images_texts,
    )

    class CountingDS(SyntheticVLTrain):
        calls = 0

        def __getitem__(self, index):
            CountingDS.calls += 1
            return super().__getitem__(index)

    class FakeEnc:
        def encode(self, caps):
            return np.zeros((len(caps), 8), np.float32)

    ds = CountingDS(12, make_train_transform(16), image_size=16, seed=0)

    def run():
        np.random.seed(123)  # the stream the transform draws from
        return get_images_texts(8, ds, FakeEnc(),
                                rng=np.random.RandomState(0))

    CountingDS.calls = 0
    img_a, txt_a = run()
    assert CountingDS.calls == 8  # single fetch per pair
    img_b, txt_b = run()
    np.testing.assert_array_equal(img_a, img_b)
    np.testing.assert_array_equal(txt_a, txt_b)


def test_stem_s2d_env_override_survives_configure(monkeypatch):
    """config.py documents MDD_STEM_S2D=1 as the A/B override; it must
    win over cfg.stem_s2d when the CLIs call configure(cfg) after
    import (previously configure() stomped it back to the default)."""
    from multimodal_dataset_distillation_tpu.ops import s2d

    prev = s2d.enabled()
    try:
        monkeypatch.setenv("MDD_STEM_S2D", "1")
        s2d.configure(Config(stem_s2d=False))
        assert s2d.enabled()
        monkeypatch.setenv("MDD_STEM_S2D", "0")
        s2d.configure(Config(stem_s2d=True))
        assert not s2d.enabled()
        monkeypatch.delenv("MDD_STEM_S2D")
        s2d.configure(Config(stem_s2d=True))
        assert s2d.enabled()
        s2d.configure(Config(stem_s2d=False))
        assert not s2d.enabled()
    finally:
        s2d.set_enabled(prev)


def test_seeded_loader_deterministic_across_schedules():
    """A SEEDED Loader's augmented batches are a pure function of
    (seed, epoch, index) via the per-item thread-local augment RNG
    (utils/augrng) — identical across runs AND across worker counts.
    Before this, transforms drew from the process-global np.random under
    concurrency: racy and schedule-ordered (two same-seed runs produced
    different expert trajectories)."""
    from multimodal_dataset_distillation_tpu.data.datasets import (
        SyntheticVLTrain,
    )

    def batches(workers):
        ds = SyntheticVLTrain(24, make_train_transform(16), image_size=16,
                              seed=0)
        loader = Loader(ds, batch_size=8, shuffle=True, drop_last=True,
                        num_workers=workers, seed=7)
        return [np.asarray(b[0]) for b in loader]

    a, b = batches(4), batches(4)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = batches(1)
    for x, y in zip(a, c):
        np.testing.assert_array_equal(x, y)


def test_get_images_texts_threaded_matches_sequential():
    """With per-item augment seeding, the opt-in thread pool produces
    bit-identical init to the sequential default."""
    from multimodal_dataset_distillation_tpu.data.datasets import (
        SyntheticVLTrain,
    )
    from multimodal_dataset_distillation_tpu.engine.distill import (
        get_images_texts,
    )

    class FakeEnc:
        def encode(self, caps):
            return np.zeros((len(caps), 8), np.float32)

    ds = SyntheticVLTrain(12, make_train_transform(16), image_size=16,
                          seed=0)
    img_a, _ = get_images_texts(8, ds, FakeEnc(),
                                rng=np.random.RandomState(3))
    img_b, _ = get_images_texts(8, ds, FakeEnc(),
                                rng=np.random.RandomState(3), num_workers=4)
    np.testing.assert_array_equal(img_a, img_b)
