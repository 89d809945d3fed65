"""ops/pallas_gconv: grouped 3x3 conv primitive — AD wiring + kernels.

The primitive must be EXACTLY lax.conv_general_dilated(fgc=G) under
every composition the framework uses (SURVEY.md §2.2 row 2: the
meta-gradient is a JVP through the inner VJP):

- forward, grad wrt both operands
- jvp-of-grad (fr_bwd="for") and grad-of-jvp (fr_bwd="rof")
- vmap over stacked weights (parallel experts / parallel eval)
- the pallas kernels themselves (interpret mode) for the supported
  fast-path shapes (group width 64, even group count)

On CPU the primitive lowers to the lax reference, so the AD tests
exercise the JVP/transpose rules, and the interpret-mode tests exercise
the kernels.  Reference semantics: timm grouped Conv2d as used by
/root/reference/networks.py:666.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.ops import pallas_gconv as pg


def _data(G, cpg, N=3, H=5, seed=0):
    rs = np.random.RandomState(seed)
    c = G * cpg
    x = jnp.asarray(rs.randn(N, H, H, c), jnp.float32)
    w = jnp.asarray(rs.randn(3, 3, cpg, c) * 0.1, jnp.float32)
    return x, w


@pytest.mark.parametrize("G,cpg", [(2, 8), (3, 8), (6, 4)])
def test_forward_matches_lax(G, cpg):
    x, w = _data(G, cpg)
    np.testing.assert_allclose(
        pg.gconv3x3(x, w, G), pg._ref_spatial(x, w, groups=G),
        rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("G,cpg", [(2, 8), (3, 8)])
def test_grads_match_lax(G, cpg):
    x, w = _data(G, cpg)
    f_ref = lambda x, w: jnp.sum(jnp.sin(pg._ref_spatial(x, w, groups=G)))
    f_new = lambda x, w: jnp.sum(jnp.sin(pg.gconv3x3(x, w, G)))
    gr = jax.grad(f_ref, argnums=(0, 1))(x, w)
    gn = jax.grad(f_new, argnums=(0, 1))(x, w)
    for a, b in zip(gr, gn):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_hvp_both_orientations_match_lax():
    """jvp-of-grad AND grad-of-jvp — the two meta-backward orientations
    (engine/distill.py fr_bwd) must both flow through the primitive."""
    G, cpg = 2, 8
    x, w = _data(G, cpg)
    rs = np.random.RandomState(1)
    dx = jnp.asarray(rs.randn(*x.shape), jnp.float32)
    dw = jnp.asarray(rs.randn(*w.shape) * 0.1, jnp.float32)

    def loss(fn):
        return lambda x, w: jnp.sum(jnp.sin(fn(x, w)))

    f_ref = loss(lambda x, w: pg._ref_spatial(x, w, groups=G))
    f_new = loss(lambda x, w: pg.gconv3x3(x, w, G))

    def hvp_for(f):
        g = lambda p: jax.grad(lambda q: f(q[0], q[1]))(p)
        return jax.jvp(g, ((x, w),), ((dx, dw),))

    for a, b in zip(jax.tree_util.tree_leaves(hvp_for(f_ref)),
                    jax.tree_util.tree_leaves(hvp_for(f_new))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def hvp_rof(f):
        return jax.grad(
            lambda x_: jax.jvp(lambda xx: f(xx, w), (x_,), (dx,))[1])(x)

    np.testing.assert_allclose(hvp_rof(f_ref), hvp_rof(f_new),
                               rtol=1e-4, atol=1e-5)


def test_vmap_over_weights():
    G, cpg = 2, 8
    x, w = _data(G, cpg)
    wb = jnp.stack([w, w * 1.1, w * 0.9])
    vr = jax.vmap(lambda w_: pg._ref_spatial(x, w_, groups=G))(wb)
    vn = jax.vmap(lambda w_: pg.gconv3x3(x, w_, G))(wb)
    np.testing.assert_allclose(vr, vn, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("G", [2, 6])
def test_pallas_kernels_interpret(G):
    """The fast-path kernels (group width 64) in interpret mode."""
    x, w = _data(G, 64, N=2, H=5)
    ref = pg._ref_spatial(x, w, groups=G)
    y = pg._pallas_spatial(x, w, groups=G, interpret=True)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)

    rs = np.random.RandomState(2)
    ybar = jnp.asarray(rs.randn(*ref.shape), jnp.float32)
    dwr = pg._ref_wgrad(x, ybar, groups=G)
    dw = pg._pallas_wgrad(x, ybar, groups=G, interpret=True)
    np.testing.assert_allclose(dw, dwr, rtol=1e-3, atol=1e-3)


def test_unsupported_shapes_fall_back():
    """Odd group counts / non-64 group widths run the lax reference
    inside the TPU lowering too — same function output either way."""
    G, cpg = 3, 8  # unsupported fast path
    x, w = _data(G, cpg)
    y = pg._pallas_spatial(x, w, groups=G)  # falls back, no pallas_call
    np.testing.assert_allclose(y, pg._ref_spatial(x, w, groups=G),
                               rtol=1e-6, atol=1e-6)


def test_wsconv_uses_gconv_when_enabled():
    """WSConv routes grouped 3x3 stride-1 SAME convs through the
    primitive when enabled — outputs identical either way on CPU."""
    from multimodal_dataset_distillation_tpu.models.layers import WSConv

    conv = WSConv(features=128, kernel_size=(3, 3), feature_group_count=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 128),
                    jnp.float32)
    params = conv.init(jax.random.PRNGKey(0), x)
    pg.set_enabled(False)
    y_off = conv.apply(params, x)
    pg.set_enabled(True)
    try:
        y_on = conv.apply(params, x)
        jaxpr = jax.make_jaxpr(lambda p, x: conv.apply(p, x))(params, x)
        assert "mdd_gconv3x3" in str(jaxpr)
    finally:
        pg.set_enabled(False)
    np.testing.assert_allclose(y_off, y_on, rtol=1e-5, atol=1e-5)


def test_distill_step_with_primitive_enabled():
    """The primitive inside the REAL distill engine: forward-HVP custom
    VJP around a scanned inner loop with a grouped NF student
    (nf_tiny).  On CPU both paths lower to the same lax conv, so the
    results must be IDENTICAL — what this buys is coverage of the
    JVP/transpose rules under the engine's full AD composition (scan,
    flat carry, custom_vjp, partial-eval UndefinedPrimals)."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )

    def run(enabled):
        pg.set_enabled(enabled)
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
            from multimodal_dataset_distillation_tpu.utils.flat import (
                flatten_params,
            )
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
            pg.set_enabled(False)

    loss_off, img_off = run(False)
    loss_on, img_on = run(True)
    assert np.isfinite(loss_on)
    np.testing.assert_allclose(loss_on, loss_off, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(img_on, img_off, rtol=1e-6, atol=1e-6)


def test_gate_configure_then_manual_enable():
    """In-suite ordering regression: a CLI-driving test calls
    configure() on the 8-virtual-device host (-> force-off), and a later
    test's set_enabled(True) must still win — manual override clears the
    force-off, while an ACTIVE force-off beats the env var."""
    import os

    from multimodal_dataset_distillation_tpu.config import Config

    try:
        pg.configure(Config())           # 8 virtual devices -> force-off
        assert not pg.enabled()
        pg.set_enabled(True)
        assert pg.enabled()
        pg.configure(Config())
        os.environ["MDD_PALLAS_GCONV"] = "1"
        try:
            assert not pg.enabled()      # env cannot defeat force-off
        finally:
            del os.environ["MDD_PALLAS_GCONV"]
    finally:
        pg.set_enabled(False)
