"""ops/s2d: space-to-depth stem rewrite — exactness under every
composition the framework uses.

The rewrite must be mathematically identical to the plain TF-SAME convs
(same sums, reassociation-level float noise only): forward, gradients
w.r.t. images (the distillation meta-gradient path!) and params, and
the full distill-engine step.  Reference semantics being preserved:
timm ``nfnet_l0`` deep_quad stem as built by
/root/reference/networks.py:666.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.ops import s2d


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 5),
                    jnp.float32)
    for f in (2, 4):
        y = s2d.space_to_depth(x, f)
        assert y.shape == (2, 8 // f, 12 // f, f * f * 5)
        np.testing.assert_array_equal(s2d.depth_to_space(y, f), x)


def _ref_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _s2d_conv(x_s2d, w, stride, fi, fo):
    w2 = s2d.rearrange_kernel(w, stride, fi, fo)
    pl, ph = s2d.block_padding(w.shape[0], stride, fi, fo)
    return jax.lax.conv_general_dilated(
        x_s2d, w2, window_strides=(1, 1), padding=((pl, ph), (pl, ph)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# the four deep_quad stem geometries: (stride, fi, fo, cin, cout)
STEM_GEOMS = [
    (2, 4, 2, 3, 16),    # stem_conv1: s2d(4) input, s2d(2) output
    (1, 2, 2, 16, 32),   # stem_conv2
    (1, 2, 2, 32, 64),   # stem_conv3
    (2, 2, 1, 64, 128),  # stem_conv4: native output
]


@pytest.mark.parametrize("stride,fi,fo,cin,cout", STEM_GEOMS)
def test_rearranged_conv_matches_tf_same(stride, fi, fo, cin, cout):
    rs = np.random.RandomState(cin)
    H = 16
    x = jnp.asarray(rs.randn(2, H, H, cin), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, cin, cout) * 0.1, jnp.float32)
    y_ref = _ref_conv(x, w, stride)
    y = _s2d_conv(s2d.space_to_depth(x, fi), w, stride, fi, fo)
    if fo > 1:
        y = s2d.depth_to_space(y, fo)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("stride,fi,fo,cin,cout", STEM_GEOMS[:2])
def test_rearranged_conv_grads_match(stride, fi, fo, cin, cout):
    """Gradients w.r.t. BOTH operands — the meta-gradient differentiates
    through the stem w.r.t. the synthetic images."""
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(2, 16, 16, cin), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, cin, cout) * 0.1, jnp.float32)

    def f_ref(x, w):
        return jnp.sum(jnp.sin(_ref_conv(x, w, stride)))

    def f_new(x, w):
        y = _s2d_conv(s2d.space_to_depth(x, fi), w, stride, fi, fo)
        return jnp.sum(jnp.sin(y if fo == 1 else s2d.depth_to_space(y, fo)))

    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    gn = jax.grad(f_new, argnums=(0, 1))(x, w)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


# the single-conv stems of the other two NF zoo members (reference
# builds them via timm: nf_resnet50 7x7/s2 + pool, nf_regnet_b1 3x3/s2 —
# networks.py:670-672): (k, stride, fi, fo, cin, cout)
OTHER_STEM_GEOMS = [
    (7, 2, 2, 1, 3, 64),   # nf_resnet50 stem_conv (pre-pool)
    (3, 2, 2, 1, 3, 32),   # nf_regnet_b1 stem_conv (40 x wf 0.75 -> 32)
]


@pytest.mark.parametrize("k,stride,fi,fo,cin,cout", OTHER_STEM_GEOMS)
def test_rearranged_conv_matches_tf_same_other_stems(k, stride, fi, fo,
                                                     cin, cout):
    rs = np.random.RandomState(k)
    H = 16
    x = jnp.asarray(rs.randn(2, H, H, cin), jnp.float32)
    w = jnp.asarray(rs.randn(k, k, cin, cout) * 0.1, jnp.float32)
    y_ref = _ref_conv(x, w, stride)
    y = _s2d_conv(s2d.space_to_depth(x, fi), w, stride, fi, fo)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(y, y_ref, rtol=1e-5, atol=1e-5)


def _tiny_cfg(stem_type):
    import dataclasses

    from multimodal_dataset_distillation_tpu.models import nfnet

    return dataclasses.replace(
        nfnet.NF_TINY, stem_type=stem_type,
        stem_chs=8 if stem_type == "7x7_pool" else 8,
        group_size=8 if stem_type == "3x3" else nfnet.NF_TINY.group_size)


@pytest.mark.parametrize("stem_type", ["7x7_pool", "3x3"])
def test_other_stem_model_parity(stem_type):
    """Model-level fwd + image-grad parity for the non-deep_quad stems
    (--stem_s2d must be a pure layout choice for the whole NF zoo)."""
    from multimodal_dataset_distillation_tpu.models import nfnet

    model = nfnet.NormFreeNet(_tiny_cfg(stem_type))
    x = jnp.asarray(np.random.RandomState(3).randn(2, 32, 32, 3),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def run(enabled):
        s2d.set_enabled(enabled)
        try:
            p2 = model.init(jax.random.PRNGKey(0), x)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(a, b),
                params, p2)
            y = model.apply(params, x)
            g = jax.grad(
                lambda xx: jnp.sum(model.apply(params, xx) ** 2))(x)
            return np.asarray(y), np.asarray(g)
        finally:
            s2d.set_enabled(False)

    y_off, g_off = run(False)
    y_on, g_on = run(True)
    np.testing.assert_allclose(y_on, y_off, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(g_on, g_off, rtol=1e-4, atol=1e-4)


def _nf_tiny_fwd(enabled, H=32, grad=False):
    from multimodal_dataset_distillation_tpu.models import nfnet

    model = nfnet.nf_tiny()
    x = jnp.asarray(np.random.RandomState(0).randn(2, H, H, 3),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    s2d.set_enabled(enabled)
    try:
        # param tree must be IDENTICAL either way (checkpoints/buffers)
        p2 = model.init(jax.random.PRNGKey(0), x)
        chk = jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b), params, p2)
        del chk
        if not grad:
            return np.asarray(model.apply(params, x))
        g = jax.grad(lambda xx: jnp.sum(model.apply(params, xx) ** 2))(x)
        return np.asarray(g)
    finally:
        s2d.set_enabled(False)


def test_nf_tiny_forward_parity():
    y_off = _nf_tiny_fwd(False)
    y_on = _nf_tiny_fwd(True)
    np.testing.assert_allclose(y_on, y_off, rtol=2e-5, atol=2e-5)


def test_nf_tiny_image_grad_parity():
    g_off = _nf_tiny_fwd(False, grad=True)
    g_on = _nf_tiny_fwd(True, grad=True)
    np.testing.assert_allclose(g_on, g_off, rtol=1e-4, atol=1e-5)


def test_non_divisible_input_falls_back():
    """Inputs whose H/W are not multiples of 4 silently use the plain
    stem (same params, so this is purely a trace-time branch)."""
    y_off = _nf_tiny_fwd(False, H=30)
    y_on = _nf_tiny_fwd(True, H=30)
    np.testing.assert_array_equal(y_on, y_off)


def test_distill_step_with_s2d_stem():
    """The rewrite inside the REAL distill engine: forward-HVP custom
    VJP around the scanned inner loop with the nf_tiny student.  The
    meta-gradient w.r.t. the synthetic images flows through
    rearrange_kernel's pads and the block-space conv; results must
    match the plain stem to float tolerance."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    def run(enabled):
        s2d.set_enabled(enabled)
        try:
            cfg = Config(
                image_encoder="nf_tiny", image_size=32,
                num_queries=4, syn_steps=2, mini_batch_size=2,
                lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
                lr_teacher_img=0.05, lr_teacher_txt=0.05, seed=0)
            model = VLBiEncoder(image_encoder_name="nf_tiny",
                                text_embedding=768, image_embedding=128,
                                proj_dropout=0.0)
            variables = init_bi_encoder(model, cfg)
            rng = np.random.RandomState(0)
            image_syn = rng.randn(4, 32, 32, 3).astype(np.float32)
            text_syn = rng.randn(4, 768).astype(np.float32)
            d = Distiller(cfg, model, variables, image_syn, text_syn)
            img_flat, _ = flatten_params(
                variables["params"]["image_encoder"])
            txt_flat, _ = flatten_params(
                variables["params"]["text_projection"])
            i0 = np.asarray(img_flat)
            t0 = np.asarray(txt_flat)
            it = (i0 + 0.01 * rng.randn(*i0.shape)).astype(np.float32)
            tt = (t0 + 0.01 * rng.randn(*t0.shape)).astype(np.float32)
            m = d.step(i0, t0, it, tt, d.sample_indices(
                np.random.RandomState(1)))
            return (float(m["grand_loss"]),
                    np.asarray(d.state.image_syn).copy())
        finally:
            s2d.set_enabled(False)

    loss_off, img_off = run(False)
    loss_on, img_on = run(True)
    assert np.isfinite(loss_on)
    np.testing.assert_allclose(loss_on, loss_off, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(img_on, img_off, rtol=1e-4, atol=1e-5)


def test_s2d_stem_gspmd_sharded_step():
    """Unlike the pallas gconv (single-device only), the s2d path is
    plain lax convs, so GSPMD must be able to partition it: the distill
    step with the s2d stem on an 8-device mesh (shard_syn sharding the
    query axis) must run and match the unsharded s2d run exactly-ish."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )
    from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    def run(mesh):
        s2d.set_enabled(True)
        try:
            cfg = Config(
                image_encoder="nf_tiny", image_size=32,
                num_queries=8, syn_steps=2, mini_batch_size=8,
                lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
                lr_teacher_img=0.05, lr_teacher_txt=0.05, seed=0,
                shard_syn=mesh is not None)
            model = VLBiEncoder(image_encoder_name="nf_tiny",
                                text_embedding=768, image_embedding=128,
                                proj_dropout=0.0)
            variables = init_bi_encoder(model, cfg)
            rng = np.random.RandomState(0)
            image_syn = rng.randn(8, 32, 32, 3).astype(np.float32)
            text_syn = rng.randn(8, 768).astype(np.float32)
            d = Distiller(cfg, model, variables, image_syn, text_syn,
                          mesh=mesh)
            img_flat, _ = flatten_params(
                variables["params"]["image_encoder"])
            txt_flat, _ = flatten_params(
                variables["params"]["text_projection"])
            i0 = np.asarray(img_flat)
            t0 = np.asarray(txt_flat)
            it = (i0 + 0.01 * rng.randn(*i0.shape)).astype(np.float32)
            tt = (t0 + 0.01 * rng.randn(*t0.shape)).astype(np.float32)
            m = d.step(i0, t0, it, tt, d.sample_indices(
                np.random.RandomState(1)))
            return (float(m["grand_loss"]),
                    np.asarray(d.state.image_syn).copy())
        finally:
            s2d.set_enabled(False)

    loss_1, img_1 = run(None)
    loss_8, img_8 = run(get_mesh((8,), ("data",)))
    assert np.isfinite(loss_8)
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(img_8, img_1, rtol=1e-4, atol=1e-5)
