"""Non-divisible minibatch / query counts on a device mesh.

The headline config (nq=100, mb=100) does not divide a v5e-8 mesh; the
reference's ``torch.nn.DataParallel`` scatters uneven chunks without
complaint (``/root/reference/distill.py:443-445``).  The TPU-native
equivalent is pad-and-mask: the inner minibatch is padded to the next
mesh multiple with masked slots, and shard_syn pads the synthetic state
with inert rows.  These tests pin the exactness claim: the masked padded
program computes the SAME loss and the SAME gradients as the unpadded
single-device one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.engine.distill import Distiller
from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder
from multimodal_dataset_distillation_tpu.ops.contrastive import _symmetric_ce
from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh
from multimodal_dataset_distillation_tpu.utils.flat import flatten_params


def test_masked_ce_equals_unpadded_exactly():
    rng = np.random.RandomState(0)
    n, pad = 5, 3
    f = rng.randn(n + pad, 7).astype(np.float32)
    g = rng.randn(n + pad, 7).astype(np.float32)
    # pad rows duplicate row 0, exactly like the padded index path
    f[n:] = f[0]
    g[n:] = g[0]
    mask = jnp.concatenate([jnp.ones(n), jnp.zeros(pad)])

    def loss_pad(f, g):
        return _symmetric_ce(14.0 * f @ g.T, mask, n)

    def loss_ref(f, g):
        return _symmetric_ce(14.0 * f[:n] @ g[:n].T)

    lp = float(loss_pad(jnp.asarray(f), jnp.asarray(g)))
    lr = float(loss_ref(jnp.asarray(f), jnp.asarray(g)))
    assert lp == pytest.approx(lr, abs=0, rel=1e-6)

    gp = jax.grad(loss_pad)(jnp.asarray(f), jnp.asarray(g))
    gr = jax.grad(loss_ref)(jnp.asarray(f), jnp.asarray(g))
    # pad rows receive exactly zero gradient
    np.testing.assert_array_equal(np.asarray(gp[n:]), 0.0)
    np.testing.assert_allclose(np.asarray(gp[:n]), np.asarray(gr[:n]),
                               rtol=1e-5, atol=1e-7)


def _setup(mesh, num_queries=10, mini_batch=10, syn_steps=2, image_size=16):
    """nq/mb chosen to NOT divide the 8-device mesh (10 % 8 == 2)."""
    cfg = Config(
        image_encoder="convnet_tiny", image_size=image_size,
        num_queries=num_queries, syn_steps=syn_steps,
        mini_batch_size=mini_batch,
        lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
        lr_teacher_img=0.05, lr_teacher_txt=0.05, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(num_queries, image_size, image_size, 3).astype(
        np.float32)
    text_syn = rng.randn(num_queries, 768).astype(np.float32)
    d = Distiller(cfg, model, variables, image_syn, text_syn, mesh=mesh)
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0 = np.asarray(txt_flat)
    it = (i0 + 0.01 * rng.randn(*i0.shape)).astype(np.float32)
    tt = (t0 + 0.01 * rng.randn(*t0.shape)).astype(np.float32)
    return d, i0, t0, it, tt


@pytest.mark.slow
def test_uneven_mesh_step_matches_single_device():
    mesh = get_mesh((8,), ("data",))
    with mesh:
        dm, i0, t0, it, tt = _setup(mesh)
        # shard_syn padded the state to the mesh multiple (10 -> 16)
        assert dm._syn_pad == 6
        assert dm.state.image_syn.shape[0] == 16
        assert dm.n_queries == 10
        # inner minibatch padded 10 -> 16
        assert dm._inner_pad == 6
        idx = dm.sample_indices(np.random.RandomState(3))
        assert idx.shape == (2, 10) and idx.max() < 10
        m_mesh = dm.step(i0, t0, it, tt, idx)

    ds, *_ = _setup(None)
    m_single = ds.step(i0, t0, it, tt, idx)

    assert np.isfinite(float(m_mesh["grand_loss"]))
    np.testing.assert_allclose(float(m_mesh["grand_loss"]),
                               float(m_single["grand_loss"]),
                               rtol=2e-5)
    img_mesh, txt_mesh = dm.syn_arrays()
    img_single, txt_single = ds.syn_arrays()
    assert img_mesh.shape == img_single.shape == (10, 16, 16, 3)
    np.testing.assert_allclose(img_mesh, img_single, rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(txt_mesh, txt_single, rtol=2e-4, atol=1e-6)
    # pad rows of the sharded state never move from their (zero) init
    pad_rows = np.asarray(dm.state.image_syn)[10:]
    np.testing.assert_array_equal(pad_rows, 0.0)


@pytest.mark.slow
def test_uneven_mesh_meta_gradients_match_single_device():
    """The VERDICT item-2 'Done' bar: masked-pad gradients equal the
    unpadded single-device gradients."""
    mesh = get_mesh((8,), ("data",))
    with mesh:
        dm, i0, t0, it, tt = _setup(mesh)
        idx = jnp.asarray(dm.sample_indices(np.random.RandomState(5)))
        keys = jax.random.split(jax.random.PRNGKey(11), 2)
        img_syn = dm.state.image_syn
        txt_syn = dm.state.text_syn

        def loss_mesh(im, tx):
            return dm.grand_loss(im, tx, dm.state.syn_lr_img,
                                 dm.state.syn_lr_txt,
                                 jnp.asarray(i0), jnp.asarray(t0),
                                 jnp.asarray(it), jnp.asarray(tt),
                                 idx, keys)[0]

        gm_img, gm_txt = jax.jit(jax.grad(loss_mesh, argnums=(0, 1)))(
            img_syn, txt_syn)
        gm_img = np.asarray(gm_img)
        gm_txt = np.asarray(gm_txt)

    ds, *_ = _setup(None)

    def loss_single(im, tx):
        return ds.grand_loss(im, tx, ds.state.syn_lr_img,
                             ds.state.syn_lr_txt,
                             jnp.asarray(i0), jnp.asarray(t0),
                             jnp.asarray(it), jnp.asarray(tt),
                             idx, keys)[0]

    gs_img, gs_txt = jax.jit(jax.grad(loss_single, argnums=(0, 1)))(
        ds.state.image_syn, ds.state.text_syn)

    # logical rows match; pad rows exactly zero
    np.testing.assert_allclose(gm_img[:10], np.asarray(gs_img),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_allclose(gm_txt[:10], np.asarray(gs_txt),
                               rtol=2e-4, atol=1e-7)
    np.testing.assert_array_equal(gm_img[10:], 0.0)
    np.testing.assert_array_equal(gm_txt[10:], 0.0)
