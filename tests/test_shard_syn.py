"""--shard_syn parity: query-sharded synthetic tensors == unsharded.

VERDICT r1 item 6: at num_queries=500 the replicated image_syn pixel
tensor (~300 MB) and its per-inner-step meta-gradient scatter dominate
the inner step. shard_syn splits image_syn/text_syn (+ meta-gradients +
momentum) over the mesh "data" axis.  Indices stay GLOBAL, so the math
is identical — these tests pin that down on the 8-virtual-device mesh.

Reference scaling context: distill.py:510-513 minibatches from the full
replicated synthetic set.
"""

import jax
import numpy as np

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.engine.distill import Distiller
from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder
from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh
from multimodal_dataset_distillation_tpu.utils.flat import flatten_params


def _setup(mesh, shard_syn, nq=16, steps=2):
    cfg = Config(image_encoder="convnet_tiny", image_size=16,
                 num_queries=nq, syn_steps=steps, mini_batch_size=8,
                 lr_teacher_img=0.05, lr_teacher_txt=0.05, seed=0,
                 lr_img=100.0, lr_txt=100.0, lr_lr=1e-2,
                 shard_syn=shard_syn)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(nq, 16, 16, 3).astype(np.float32)
    text_syn = rng.randn(nq, 768).astype(np.float32)
    d = Distiller(cfg, model, variables, image_syn, text_syn, mesh=mesh)
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    img_th0 = np.asarray(img_flat)
    txt_th0 = np.asarray(txt_flat)
    img_tgt = img_th0 + 0.01 * rng.randn(*img_th0.shape).astype(np.float32)
    txt_tgt = txt_th0 + 0.01 * rng.randn(*txt_th0.shape).astype(np.float32)
    return d, (img_th0, txt_th0, img_tgt, txt_tgt)


def test_shard_syn_state_is_sharded():
    mesh = get_mesh((8,), ("data",))
    d, _ = _setup(mesh, shard_syn=True)
    spec = d.state.image_syn.sharding.spec
    assert tuple(spec)[:1] == ("data",), spec
    spec_t = d.state.text_syn.sharding.spec
    assert tuple(spec_t)[:1] == ("data",), spec_t
    # momentum buffer sharded with its parameter
    traces = [x for x in jax.tree_util.tree_leaves(d.state.opt_img)
              if getattr(x, "shape", None) == d.state.image_syn.shape]
    assert traces and tuple(traces[0].sharding.spec)[:1] == ("data",)


def test_shard_syn_step_matches_unsharded():
    """Full outer step: metrics AND updated synthetic state agree."""
    mesh = get_mesh((8,), ("data",))
    d_ref, flats = _setup(None, shard_syn=False)
    d_sh, _ = _setup(mesh, shard_syn=True)

    idx = d_ref.sample_indices(np.random.RandomState(1))
    for step in range(3):
        m_ref = d_ref.step(*flats, idx)
        m_sh = d_sh.step(*flats, idx)
        for k in ("grand_loss", "img_param_loss", "txt_param_loss",
                  "syn_lr_img_grad", "syn_lr_txt_grad"):
            np.testing.assert_allclose(float(m_ref[k]), float(m_sh[k]),
                                       rtol=2e-4, err_msg=f"{k} @ step {step}")
    np.testing.assert_allclose(np.asarray(d_ref.state.image_syn),
                               np.asarray(d_sh.state.image_syn),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_ref.state.text_syn),
                               np.asarray(d_sh.state.text_syn),
                               rtol=1e-3, atol=1e-5)
    # sharding survives the donated update loop
    assert tuple(d_sh.state.image_syn.sharding.spec)[:1] == ("data",)


def test_shard_syn_meta_gradient_parity():
    """jax.grad of grand_loss on (image_syn, text_syn) matches unsharded."""
    mesh = get_mesh((8,), ("data",))
    d_ref, flats = _setup(None, shard_syn=False)
    d_sh, _ = _setup(mesh, shard_syn=True)
    idx = d_ref.sample_indices(np.random.RandomState(2))
    keys = jax.random.split(jax.random.PRNGKey(7), idx.shape[0])

    def grads_of(d):
        g = jax.jit(jax.grad(d.grand_loss, argnums=(0, 1), has_aux=True))
        (gi, gt), _ = g(d.state.image_syn, d.state.text_syn,
                        d.state.syn_lr_img, d.state.syn_lr_txt,
                        *[np.asarray(f) for f in flats],
                        np.asarray(idx), keys)
        return np.asarray(gi), np.asarray(gt)

    gi_r, gt_r = grads_of(d_ref)
    gi_s, gt_s = grads_of(d_sh)
    np.testing.assert_allclose(gi_r, gi_s, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(gt_r, gt_s, rtol=1e-3, atol=1e-6)


def test_shard_syn_pads_when_indivisible():
    """nq not divisible by the data axis -> padded with inert rows and
    sharded anyway (round 4; the pre-r4 behavior silently skipped
    sharding).  Deeper parity coverage: tests/test_uneven_shard.py."""
    mesh = get_mesh((8,), ("data",))
    cfg = Config(image_encoder="convnet_tiny", image_size=16,
                 num_queries=12, syn_steps=2, mini_batch_size=8,
                 lr_teacher_img=0.05, lr_teacher_txt=0.05, shard_syn=True)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    img = rng.randn(12, 16, 16, 3).astype(np.float32)
    txt = rng.randn(12, 768).astype(np.float32)
    d = Distiller(cfg, model, variables, img, txt, mesh=mesh)
    assert d._syn_shardings is not None
    assert d.n_queries == 12 and d._syn_pad == 4
    assert d.state.image_syn.shape[0] == 16
    assert tuple(d.state.image_syn.sharding.spec)[:1] == ("data",)
    # logical view strips the padding and preserves the data
    a, b = d.syn_arrays()
    np.testing.assert_array_equal(a, img)
    np.testing.assert_array_equal(b, txt)
    # indices never reach the pad rows
    idx = d.sample_indices(np.random.RandomState(1))
    assert idx.max() < 12
