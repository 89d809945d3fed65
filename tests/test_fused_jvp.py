"""Merged-tangent conv rule (ops/fused_jvp.py) — exactness and engine
composition.

The rule rewrites the share-x {primal, weight-tangent} conv pair of the
forward-HVP backward's inner jvp as one conv with per-group doubled
output channels (DESIGN.md §10: the conv fusions are the measured
headline bottleneck; this removes duplicate activation reads and runs
the NF grouped 3x3s 128 lanes wide).  The math must be exact: each
output channel of a convolution is computed independently of the
others, so the merged form is the same sums in the same order.

Reference context: the torch loop pays the same backward via
``autograd.grad(create_graph=True)`` (distill_original.py:413-438) with
no such fusion.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from multimodal_dataset_distillation_tpu.ops import fused_jvp


def _raw(x, w, strides, groups):
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding="SAME",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("groups,strides,kern,inch,outch", [
    (1, (1, 1), 1, 8, 16),    # 1x1 "matmul" conv
    (1, (2, 2), 3, 8, 16),    # dense strided (stem-like)
    (4, (1, 1), 3, 8, 16),    # grouped 3x3 (NF bottleneck form)
])
def test_rule_matches_jax_jvp(groups, strides, kern, inch, outch):
    """(y, dy) from the merged rule == jax.jvp of the plain conv, for
    both-tangent and weight-only-tangent (SymbolicZero dx) cases."""
    with jax.enable_x64():
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 8, 8, inch))
        w = jnp.asarray(rng.randn(kern, kern, inch // groups, outch))
        dx = jnp.asarray(rng.randn(*x.shape))
        dw = jnp.asarray(rng.randn(*w.shape))
        fconv = functools.partial(fused_jvp.conv, strides=strides,
                                  padding="SAME", groups=groups)
        pconv = functools.partial(_raw, strides=strides, groups=groups)

        y1, t1 = jax.jvp(fconv, (x, w), (dx, dw))
        y0, t0 = jax.jvp(pconv, (x, w), (dx, dw))
        np.testing.assert_allclose(y1, y0, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(t1, t0, rtol=1e-12, atol=1e-12)

        # weight-only tangent: dx is a SymbolicZero inside the rule
        # (the first conv of the tower in the rof h_fn)
        _, t1 = jax.jvp(lambda b: fconv(x, b), (w,), (dw,))
        _, t0 = jax.jvp(lambda b: pconv(x, b), (w,), (dw,))
        np.testing.assert_allclose(t1, t0, rtol=1e-12, atol=1e-12)


def test_grad_of_jvp_parity_two_layer():
    """The actual composition the engine uses (fr_bwd="rof"): reverse
    over the concrete-tangent jvp, through a dense-strided + grouped
    stack with a nonlinearity between."""
    with jax.enable_x64():
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 8, 8, 8))
        w1 = jnp.asarray(rng.randn(3, 3, 8, 16))
        w2 = jnp.asarray(rng.randn(3, 3, 4, 16))
        v1 = jnp.asarray(rng.randn(*w1.shape))
        v2 = jnp.asarray(rng.randn(*w2.shape))

        def net(x_, a, b, cs, cg):
            h = jnp.tanh(cs(x_, a))
            h = jnp.tanh(cg(h, b))
            return jnp.sum(h * h)

        def grad_of_jvp(cs, cg):
            def h_fn(x_, a, b):
                _, dh = jax.jvp(lambda aa, bb: net(x_, aa, bb, cs, cg),
                                (a, b), (v1, v2))
                return dh
            return jax.grad(h_fn, argnums=(0, 1, 2))(x, w1, w2)

        fused = grad_of_jvp(
            functools.partial(fused_jvp.conv, strides=(2, 2),
                              padding="SAME", groups=1),
            functools.partial(fused_jvp.conv, strides=(1, 1),
                              padding="SAME", groups=4))
        plain = grad_of_jvp(
            functools.partial(_raw, strides=(2, 2), groups=1),
            functools.partial(_raw, strides=(1, 1), groups=4))
        for a, b, name in zip(fused, plain, ("x", "w1", "w2")):
            np.testing.assert_allclose(
                a, b, rtol=1e-10, atol=1e-12,
                err_msg=f"grad-of-jvp mismatch on {name}")


def test_activate_scoping():
    assert not fused_jvp.active()
    with fused_jvp.activate(True):
        assert fused_jvp.active()
        with fused_jvp.activate(False):
            assert not fused_jvp.active()
        assert fused_jvp.active()
    assert not fused_jvp.active()


def test_resolve_env_override(monkeypatch):
    from multimodal_dataset_distillation_tpu.config import Config

    assert fused_jvp.resolve(Config())          # default ON (DESIGN §10 A/B)
    assert not fused_jvp.resolve(Config(fused_jvp=False))
    assert fused_jvp.resolve(Config(fused_jvp=True))
    monkeypatch.setenv("MDD_FUSED_JVP", "0")
    assert not fused_jvp.resolve(Config(fused_jvp=True))
    monkeypatch.setenv("MDD_FUSED_JVP", "1")
    assert fused_jvp.resolve(Config(fused_jvp=False))


def _nf_tiny_meta_grads(fused: bool):
    """Meta-gradients of one distill outer step with the WSConv student
    (nf_tiny), f64 throughout — covers the full engine composition:
    scan, flat carry, custom_vjp, the activate() scoping inside h_fn,
    and WSConv's trace-time routing."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    cfg = Config(
        image_encoder="nf_tiny", image_size=32,
        num_queries=4, syn_steps=2, mini_batch_size=2,
        lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
        lr_teacher_img=0.05, lr_teacher_txt=0.05,
        inner_dtype="float64", hvp_mode="forward", fr_bwd="rof",
        fused_jvp=fused, seed=0)
    model = VLBiEncoder(image_encoder_name="nf_tiny",
                        text_embedding=768, image_embedding=128,
                        proj_dropout=0.0)
    # init in f32 (WSConv pins its params f32 and raw lax.conv does not
    # promote, so an f64 init dummy input would error); cast inside x64
    variables = init_bi_encoder(model, cfg)
    with jax.enable_x64():
        variables = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, np.float64), variables)
        rng = np.random.RandomState(0)
        image_syn = rng.randn(4, 32, 32, 3)
        text_syn = rng.randn(4, 768)
        d = Distiller(cfg, model, variables, image_syn, text_syn)
        img_flat, _ = flatten_params(variables["params"]["image_encoder"])
        txt_flat, _ = flatten_params(variables["params"]["text_projection"])
        i0 = np.asarray(img_flat)
        t0 = np.asarray(txt_flat)
        it = i0 + 0.01 * rng.randn(*i0.shape)
        tt = t0 + 0.01 * rng.randn(*t0.shape)
        idx = jnp.asarray(d.sample_indices(np.random.RandomState(1)))
        keys = jax.random.split(jax.random.PRNGKey(7), cfg.syn_steps)
        loss_f = lambda *a: d.grand_loss(*a)[0]
        g = jax.grad(loss_f, argnums=(0, 1, 2, 3))(
            d.state.image_syn, d.state.text_syn,
            d.state.syn_lr_img, d.state.syn_lr_txt,
            jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it),
            jnp.asarray(tt), idx, keys)
        return [np.asarray(x) for x in g]


def test_fused_jvp_gspmd_sharded_step():
    """The merged rule is plain lax convs, so GSPMD must be able to
    partition it: the distill step with fused_jvp on an 8-device mesh
    (shard_syn sharding the query axis, data-parallel inner batches)
    must run and match the unsharded fused run exactly-ish."""
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
        cfg = Config(
            image_encoder="nf_tiny", image_size=32,
            num_queries=8, syn_steps=2, mini_batch_size=8,
            lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
            lr_teacher_img=0.05, lr_teacher_txt=0.05, seed=0,
            hvp_mode="forward", fr_bwd="rof", fused_jvp=True,
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
        img_flat, _ = flatten_params(variables["params"]["image_encoder"])
        txt_flat, _ = flatten_params(variables["params"]["text_projection"])
        i0 = np.asarray(img_flat)
        t0 = np.asarray(txt_flat)
        it = (i0 + 0.01 * rng.randn(*i0.shape)).astype(np.float32)
        tt = (t0 + 0.01 * rng.randn(*t0.shape)).astype(np.float32)
        m = d.step(i0, t0, it, tt,
                   d.sample_indices(np.random.RandomState(1)))
        return (float(m["grand_loss"]),
                np.asarray(d.state.image_syn).copy())

    loss_1, img_1 = run(None)
    loss_8, img_8 = run(get_mesh((8,), ("data",)))
    assert np.isfinite(loss_8)
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(img_8, img_1, rtol=1e-4, atol=1e-5)


def test_distill_meta_grad_parity_nf_tiny():
    plain = _nf_tiny_meta_grads(False)
    fused = _nf_tiny_meta_grads(True)
    for a, b, name in zip(fused, plain,
                          ("pixels", "texts", "lr_img", "lr_txt")):
        np.testing.assert_allclose(
            a, b, rtol=1e-9, atol=1e-11,
            err_msg=f"{name} meta-grad mismatch with fused_jvp")
