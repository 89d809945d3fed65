"""DSA suite: shapes, differentiability, batchmode semantics, strategies."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.ops.diffaug import (
    ParamDiffAug,
    diff_augment,
    rand_brightness,
    rand_contrast,
    rand_crop,
    rand_cutout,
    rand_flip,
    rand_rotate,
    rand_saturation,
    rand_scale,
)

OPS = [rand_scale, rand_rotate, rand_flip, rand_brightness, rand_saturation,
       rand_contrast, rand_crop, rand_cutout]


@pytest.mark.parametrize("op", OPS, ids=lambda f: f.__name__)
def test_op_shape_and_finite(op):
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3),
                    jnp.float32)
    y = op(x, jax.random.PRNGKey(0), ParamDiffAug(), False)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


@pytest.mark.parametrize("op", OPS, ids=lambda f: f.__name__)
def test_op_differentiable(op):
    x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3), jnp.float32)

    def f(x):
        return jnp.sum(op(x, jax.random.PRNGKey(3), ParamDiffAug(), False) ** 2)

    g = jax.grad(f)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))


def test_batchmode_shares_transform():
    # batch_shared=True (the reference's seeded Siamese mode) must apply
    # the SAME transform to every sample: identical inputs -> identical outs
    x0 = np.random.RandomState(2).randn(1, 8, 8, 3).astype(np.float32)
    x = jnp.asarray(np.repeat(x0, 4, axis=0))
    y = rand_rotate(x, jax.random.PRNGKey(1), ParamDiffAug(), True)
    for i in range(1, 4):
        np.testing.assert_allclose(np.asarray(y[0]), np.asarray(y[i]),
                                   rtol=1e-5)


def test_strategy_dispatch_modes():
    x = jnp.asarray(np.random.RandomState(3).randn(4, 8, 8, 3), jnp.float32)
    strat = "color_crop_cutout_flip_scale_rotate"
    yS = diff_augment(x, strat, jax.random.PRNGKey(0), ParamDiffAug())
    assert yS.shape == x.shape
    pM = ParamDiffAug()
    pM.aug_mode = "M"
    yM = diff_augment(x, strat, jax.random.PRNGKey(0), pM)
    assert yM.shape == x.shape
    # 'none' is identity
    np.testing.assert_array_equal(np.asarray(diff_augment(
        x, "none", jax.random.PRNGKey(0), ParamDiffAug())), np.asarray(x))


def test_jittable():
    x = jnp.asarray(np.random.RandomState(4).randn(4, 8, 8, 3), jnp.float32)
    f = jax.jit(lambda x, k: diff_augment(x, "color_flip", k, ParamDiffAug()))
    y = f(x, jax.random.PRNGKey(0))
    assert y.shape == x.shape


def test_flip_semantics():
    x = jnp.asarray(np.arange(2 * 4 * 4 * 1, dtype=np.float32
                              ).reshape(2, 4, 4, 1))
    p = ParamDiffAug()
    p.prob_flip = 1.1  # always flip
    y = rand_flip(x, jax.random.PRNGKey(0), p, False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x[:, :, ::-1, :]))


def test_legacy_augment_and_daparam():
    """Non-differentiable DC augment (utils.py:255-335)."""
    import numpy as np
    from multimodal_dataset_distillation_tpu.ops.legacy_augment import (
        augment,
        get_daparam,
    )

    p = get_daparam("MNIST", "ConvNet", "ConvNet", 1)
    assert p["strategy"] == "crop_scale_rotate"
    assert get_daparam("CIFAR10", "ConvNet", "ConvNetBN", 1)["strategy"] == "crop_noise"
    assert get_daparam("CIFAR10", "ConvNet", "ConvNet", 1)["strategy"] == "none"

    rng = np.random.RandomState(0)
    x = rng.randn(4, 16, 16, 3).astype(np.float32)
    out = augment(x, p, rng)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert not np.allclose(out, x)
    # strategy none is identity
    np.testing.assert_array_equal(augment(x, {"strategy": "none"}), x)


def test_lr_schedules():
    from multimodal_dataset_distillation_tpu.utils.schedules import (
        cosine_lr_schedule,
        step_lr_schedule,
        warmup_lr_schedule,
    )

    assert abs(cosine_lr_schedule(0, 10, 1.0, 0.1) - 1.0) < 1e-9
    assert abs(cosine_lr_schedule(10, 10, 1.0, 0.1) - 0.1) < 1e-9
    assert warmup_lr_schedule(0, 10, 0.0, 1.0) == 0.0
    assert warmup_lr_schedule(10, 10, 0.0, 1.0) == 1.0
    assert warmup_lr_schedule(20, 10, 0.0, 1.0) == 1.0
    assert abs(step_lr_schedule(2, 1.0, 0.01, 0.5) - 0.25) < 1e-9
    assert step_lr_schedule(20, 1.0, 0.01, 0.5) == 0.01
