"""Cross-framework step parity: the torch reference inner loop vs our JAX
distiller, on identical weights and minibatches.

This is the round-2 "proof of numerics against the reference code itself"
(VERDICT item 2).  The test:

1. builds a tiny torch ConvNet + ProjectionHead mirroring
   ``models/convnet.py`` / ``models/projection.py`` layer-for-layer,
2. imports identical weights into both frameworks,
3. wraps the torch nets in the reference's actual ``ReparamModule``
   (imported from ``/root/reference/reparam_module.py`` as a read-only
   *oracle* — nothing is vendored) and runs the bi-trajectory inner loop
   with the exact update rule of ``distill_original.py:413-458``
   (``autograd.grad(..., create_graph=True)``, theta <- theta - lr*g,
   normalized parameter-MSE trajectory loss),
4. asserts per-step student parameters AND the meta-gradients on
   (image_syn, text_syn, syn_lr_img, syn_lr_txt) match the JAX
   ``Distiller`` to f32 tolerance — under BOTH inner logit-scale
   conventions (upstream "fixed", fork "syn_lr").

If either framework's update rule drifts, this fails.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_dataset_distillation_tpu.config import Config  # noqa: E402
from multimodal_dataset_distillation_tpu.engine.distill import Distiller  # noqa: E402
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder  # noqa: E402
from multimodal_dataset_distillation_tpu.ops.contrastive import RAW_LOG_SCALE  # noqa: E402
from multimodal_dataset_distillation_tpu.utils.flat import flatten_params  # noqa: E402

REFERENCE_DIR = "/root/reference"


def _load_reparam_module():
    """Import the reference's ReparamModule as a parity oracle."""
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from reparam_module import ReparamModule  # type: ignore
    finally:
        sys.path.remove(REFERENCE_DIR)
    return ReparamModule


# ---------------------------------------------------------------------------
# torch mirrors of models/convnet.py::ConvNet(width=16, depth=2, gap=True,
# instancenorm) and models/projection.py::ProjectionHead (dropout off)
# ---------------------------------------------------------------------------

class TorchConvNetTiny(torch.nn.Module):
    def __init__(self, width=16, num_classes=64):
        super().__init__()
        self.conv0 = torch.nn.Conv2d(3, width, 3, padding=1)
        self.norm0 = torch.nn.GroupNorm(width, width)   # instancenorm
        self.conv1 = torch.nn.Conv2d(width, width, 3, padding=1)
        self.norm1 = torch.nn.GroupNorm(width, width)
        self.classifier = torch.nn.Linear(width, num_classes)

    def forward(self, x):
        x = F.avg_pool2d(F.relu(self.norm0(self.conv0(x))), 2)
        x = F.avg_pool2d(F.relu(self.norm1(self.conv1(x))), 2)
        x = x.mean(dim=(2, 3))      # GAP
        return self.classifier(x)


class TorchProjectionHead(torch.nn.Module):
    def __init__(self, emb=32, proj=64):
        super().__init__()
        self.projection = torch.nn.Linear(emb, proj)
        self.fc = torch.nn.Linear(proj, proj)
        self.layer_norm = torch.nn.LayerNorm(proj)

    def forward(self, x):
        p = self.projection(x)
        h = F.gelu(p)               # exact gelu, both frameworks
        h = self.fc(h)
        return self.layer_norm(h + p)


# ---- flax <-> torch weight plumbing ----------------------------------------

def _t(x):
    return torch.from_numpy(np.asarray(x, np.float32).copy())


def load_img_weights(tnet: TorchConvNetTiny, tree):
    """tree = flax ConvNet params {conv0, norm0, conv1, norm1, classifier}."""
    with torch.no_grad():
        for i in (0, 1):
            conv, norm = getattr(tnet, f"conv{i}"), getattr(tnet, f"norm{i}")
            conv.weight.copy_(_t(tree[f"conv{i}"]["kernel"]).permute(3, 2, 0, 1))
            conv.bias.copy_(_t(tree[f"conv{i}"]["bias"]))
            norm.weight.copy_(_t(tree[f"norm{i}"]["scale"]))
            norm.bias.copy_(_t(tree[f"norm{i}"]["bias"]))
        tnet.classifier.weight.copy_(_t(tree["classifier"]["kernel"]).T)
        tnet.classifier.bias.copy_(_t(tree["classifier"]["bias"]))


def load_txt_weights(tnet: TorchProjectionHead, tree):
    with torch.no_grad():
        tnet.projection.weight.copy_(_t(tree["projection"]["kernel"]).T)
        tnet.projection.bias.copy_(_t(tree["projection"]["bias"]))
        tnet.fc.weight.copy_(_t(tree["fc"]["kernel"]).T)
        tnet.fc.bias.copy_(_t(tree["fc"]["bias"]))
        tnet.layer_norm.weight.copy_(_t(tree["layer_norm"]["scale"]))
        tnet.layer_norm.bias.copy_(_t(tree["layer_norm"]["bias"]))


def img_tree_to_torch_flat(tree) -> np.ndarray:
    """Flax ConvNet params -> the torch named_parameters flat ordering
    (= ReparamModule's flat layout for TorchConvNetTiny)."""
    parts = []
    for i in (0, 1):
        parts.append(np.transpose(np.asarray(tree[f"conv{i}"]["kernel"]),
                                  (3, 2, 0, 1)).ravel())
        parts.append(np.asarray(tree[f"conv{i}"]["bias"]).ravel())
        parts.append(np.asarray(tree[f"norm{i}"]["scale"]).ravel())
        parts.append(np.asarray(tree[f"norm{i}"]["bias"]).ravel())
    parts.append(np.asarray(tree["classifier"]["kernel"]).T.ravel())
    parts.append(np.asarray(tree["classifier"]["bias"]).ravel())
    return np.concatenate(parts)


def txt_tree_to_torch_flat(tree) -> np.ndarray:
    parts = [np.asarray(tree["projection"]["kernel"]).T.ravel(),
             np.asarray(tree["projection"]["bias"]).ravel(),
             np.asarray(tree["fc"]["kernel"]).T.ravel(),
             np.asarray(tree["fc"]["bias"]).ravel(),
             np.asarray(tree["layer_norm"]["scale"]).ravel(),
             np.asarray(tree["layer_norm"]["bias"]).ravel()]
    return np.concatenate(parts)


def _perturb_tree(tree, rng, scale=0.05):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(
            np.asarray(x) + scale * np.asarray(rng.randn(*np.shape(x))),
            np.float32),
        tree)


# ---------------------------------------------------------------------------
# NFNet-architecture composition (round-2 VERDICT item 2): the reference
# inner loop (real ReparamModule + create_graph autograd) with a pure-torch
# NORMALIZER-FREE student — WS-conv, SE, skipinit, beta/alpha residual
# bookkeeping — vs the JAX distiller.  Catches WS-conv/SE *gradient*
# discrepancies the forward-only mirror (test_nfnet_torch_mirror.py)
# cannot see.
# ---------------------------------------------------------------------------

class TorchNF(torch.nn.Module):
    """timm-semantics NormFreeNet over a ParameterDict in timm-key order.

    Parameters register in state-dict insertion order, so ReparamModule's
    flat layout is exactly the concatenation of the timm-named tensors —
    the same order ``_nf_tree_to_torch_flat`` produces from a Flax tree.
    """

    def __init__(self, sd_np, cfg):
        super().__init__()
        self.cfg = cfg
        self.keys = list(sd_np.keys())
        # register_parameter preserves insertion order (ParameterDict
        # sorts keys, which would scramble the flat layout)
        for k, v in sd_np.items():
            self.register_parameter(
                k.replace(".", "__"), torch.nn.Parameter(torch.from_numpy(
                    np.ascontiguousarray(v).astype(np.float32))))

    def forward(self, x):
        from test_nfnet_torch_mirror import _torch_forward

        sd = {k: getattr(self, k.replace(".", "__")) for k in self.keys}
        return _torch_forward(x, sd, self.cfg)


def _nf_tree_to_torch_flat(tree, cfg) -> np.ndarray:
    """Flax NormFreeNet params -> TorchNF/ReparamModule flat layout."""
    from multimodal_dataset_distillation_tpu.models.import_torch import (
        nfnet_params_to_timm,
    )

    sd = nfnet_params_to_timm(tree, depths=cfg.depths, stem_convs=4)
    return np.concatenate([np.asarray(v, np.float32).ravel()
                           for v in sd.values()])


@pytest.mark.parametrize("inner_scale", ["fixed", "syn_lr"])
def test_reference_step_parity_nfnet(inner_scale):
    """The ConvNet harness below, composed with the NFNet-anatomy student
    (nf_tiny: deep_quad stem, grouped 3x3 + extra conv, SE, skipinit)."""
    from multimodal_dataset_distillation_tpu.models.import_torch import (
        nfnet_params_to_timm,
    )
    from multimodal_dataset_distillation_tpu.models.nfnet import NF_TINY

    ReparamModule = _load_reparam_module()
    torch.manual_seed(0)

    N, MB, STEPS, SIZE = 6, 3, 2, 32
    LR_I, LR_T = 0.02, 0.03
    cfg = Config(image_encoder="nf_tiny", image_size=SIZE,
                 num_queries=N, syn_steps=STEPS, mini_batch_size=MB,
                 lr_teacher_img=LR_I, lr_teacher_txt=LR_T,
                 inner_scale=inner_scale, seed=0)
    model = VLBiEncoder(image_encoder_name="nf_tiny",
                        text_embedding=32, image_embedding=128,
                        proj_dropout=0.0)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(N, SIZE, SIZE, 3).astype(np.float32)
    text_syn = rng.randn(N, 32).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(image_syn[:2]), jnp.asarray(text_syn[:2]))

    d = Distiller(cfg, model, variables, image_syn, text_syn)

    img_tree0 = jax.tree_util.tree_map(np.asarray,
                                       variables["params"]["image_encoder"])
    txt_tree0 = jax.tree_util.tree_map(np.asarray,
                                       variables["params"]["text_projection"])
    inner_nf = img_tree0[next(iter(img_tree0))]     # ImageTower -> NormFreeNet
    # jiggle gains/skipinit away from init (1/0) so WS-gain and skipinit
    # gradients are actually exercised
    def jiggle(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("gain", "skipinit_gain"):
            return np.asarray(np.asarray(leaf)
                              + 0.3 * rng.randn(*np.shape(leaf)), np.float32)
        return leaf
    img_tree0 = jax.tree_util.tree_map_with_path(jiggle, img_tree0)
    inner_nf = img_tree0[next(iter(img_tree0))]
    img_tgt_tree = _perturb_tree(img_tree0, np.random.RandomState(1))
    txt_tgt_tree = _perturb_tree(txt_tree0, np.random.RandomState(2))

    img_th0, _ = flatten_params(img_tree0)
    txt_th0, _ = flatten_params(txt_tree0)
    img_tgt, _ = flatten_params(img_tgt_tree)
    txt_tgt, _ = flatten_params(txt_tgt_tree)

    idx_seq = np.stack([rng.permutation(N)[:MB] for _ in range(STEPS)])
    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)  # dropout-free nets

    his, hts = d.unroll(jnp.asarray(image_syn), jnp.asarray(text_syn),
                        jnp.asarray(LR_I), jnp.asarray(LR_T),
                        img_th0, txt_th0, jnp.asarray(idx_seq), keys)
    (jax_loss, _), jax_grads = jax.value_and_grad(
        d.grand_loss, argnums=(0, 1, 2, 3), has_aux=True)(
        jnp.asarray(image_syn), jnp.asarray(text_syn),
        jnp.asarray(LR_I), jnp.asarray(LR_T),
        img_th0, txt_th0, img_tgt, txt_tgt, jnp.asarray(idx_seq), keys)

    # ---- torch: reference loop with the NF student under ReparamModule ----
    sd_np = nfnet_params_to_timm(inner_nf, depths=NF_TINY.depths,
                                 stem_convs=4)
    t_img = TorchNF(sd_np, NF_TINY)
    t_txt = TorchProjectionHead(emb=32, proj=128)
    load_txt_weights(t_txt, txt_tree0)
    rm_img = ReparamModule(t_img)
    rm_txt = ReparamModule(t_txt)

    timg_syn = torch.from_numpy(
        image_syn.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    ttxt_syn = torch.from_numpy(text_syn.copy()).requires_grad_(True)
    syn_lr_img = torch.tensor(LR_I, requires_grad=True)
    syn_lr_txt = torch.tensor(LR_T, requires_grad=True)

    img_p = [torch.from_numpy(
        _nf_tree_to_torch_flat(inner_nf, NF_TINY)).requires_grad_(True)]
    txt_p = [torch.from_numpy(txt_tree_to_torch_flat(txt_tree0)
                              ).requires_grad_(True)]
    t_img_tgt = torch.from_numpy(_nf_tree_to_torch_flat(
        img_tgt_tree[next(iter(img_tgt_tree))], NF_TINY))
    t_txt_tgt = torch.from_numpy(txt_tree_to_torch_flat(txt_tgt_tree))

    np.testing.assert_allclose(rm_img.flat_param.detach().numpy(),
                               img_p[0].detach().numpy(), rtol=0, atol=0)

    for s in range(STEPS):
        sel = torch.from_numpy(idx_seq[s].astype(np.int64))
        x = rm_img(timg_syn[sel], flat_param=img_p[-1])
        x = x / x.norm(dim=1, keepdim=True)
        y = rm_txt(ttxt_syn[sel], flat_param=txt_p[-1])
        y = y / y.norm(dim=1, keepdim=True)
        scale = (float(RAW_LOG_SCALE) if inner_scale == "fixed"
                 else syn_lr_img)
        logits = scale * x.float() @ y.float().t()
        labels = torch.arange(len(logits))
        loss = (F.cross_entropy(logits, labels)
                + F.cross_entropy(logits.t(), labels)) / 2
        gi = torch.autograd.grad(loss, img_p[-1], create_graph=True)[0]
        gt = torch.autograd.grad(loss, txt_p[-1], create_graph=True)[0]
        img_p.append(img_p[-1] - syn_lr_img * gi)
        txt_p.append(txt_p[-1] - syn_lr_txt * gt)

        jtree = d._unravel_img(his[s])
        jflat = _nf_tree_to_torch_flat(jtree[next(iter(jtree))], NF_TINY)
        np.testing.assert_allclose(jflat, img_p[-1].detach().numpy(),
                                   rtol=5e-4, atol=5e-6,
                                   err_msg=f"img student step {s}")
        jflat_t = txt_tree_to_torch_flat(d._unravel_txt(hts[s]))
        np.testing.assert_allclose(jflat_t, txt_p[-1].detach().numpy(),
                                   rtol=5e-4, atol=5e-6,
                                   err_msg=f"txt student step {s}")

    img_loss = (F.mse_loss(img_p[-1], t_img_tgt, reduction="sum")
                / F.mse_loss(img_p[0], t_img_tgt, reduction="sum"))
    txt_loss = (F.mse_loss(txt_p[-1], t_txt_tgt, reduction="sum")
                / F.mse_loss(txt_p[0], t_txt_tgt, reduction="sum"))
    grand = img_loss + txt_loss
    t_gi, t_gt, t_gli, t_glt = torch.autograd.grad(
        grand, [timg_syn, ttxt_syn, syn_lr_img, syn_lr_txt],
        allow_unused=False)

    np.testing.assert_allclose(float(jax_loss), float(grand),
                               rtol=5e-4, err_msg="grand_loss")
    np.testing.assert_allclose(
        np.asarray(jax_grads[0]),
        t_gi.detach().numpy().transpose(0, 2, 3, 1),
        rtol=5e-3, atol=1e-6, err_msg="d(grand)/d(image_syn)")
    np.testing.assert_allclose(np.asarray(jax_grads[1]),
                               t_gt.detach().numpy(),
                               rtol=5e-3, atol=1e-6,
                               err_msg="d(grand)/d(text_syn)")
    np.testing.assert_allclose(float(jax_grads[2]), float(t_gli),
                               rtol=5e-3, atol=1e-7,
                               err_msg="d(grand)/d(syn_lr_img)")
    np.testing.assert_allclose(float(jax_grads[3]), float(t_glt),
                               rtol=5e-3, atol=1e-7,
                               err_msg="d(grand)/d(syn_lr_txt)")


@pytest.mark.parametrize("inner_scale", ["fixed", "syn_lr"])
def test_reference_step_parity(inner_scale):
    ReparamModule = _load_reparam_module()
    torch.manual_seed(0)

    N, MB, STEPS, SIZE = 8, 4, 3, 16
    LR_I, LR_T = 0.02, 0.03
    cfg = Config(image_encoder="convnet_tiny", image_size=SIZE,
                 num_queries=N, syn_steps=STEPS, mini_batch_size=MB,
                 lr_teacher_img=LR_I, lr_teacher_txt=LR_T,
                 inner_scale=inner_scale, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=32, image_embedding=64,
                        proj_dropout=0.0)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(N, SIZE, SIZE, 3).astype(np.float32)
    text_syn = rng.randn(N, 32).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(image_syn[:2]), jnp.asarray(text_syn[:2]))

    d = Distiller(cfg, model, variables, image_syn, text_syn)

    # ---- identical start/target parameter vectors in both frameworks ----
    img_tree0 = jax.tree_util.tree_map(np.asarray,
                                       variables["params"]["image_encoder"])
    txt_tree0 = jax.tree_util.tree_map(np.asarray,
                                       variables["params"]["text_projection"])
    inner_img = img_tree0[next(iter(img_tree0))]   # ImageTower -> ConvNet_0
    img_tgt_tree = _perturb_tree(img_tree0, np.random.RandomState(1))
    txt_tgt_tree = _perturb_tree(txt_tree0, np.random.RandomState(2))

    img_th0, _ = flatten_params(img_tree0)
    txt_th0, _ = flatten_params(txt_tree0)
    img_tgt, _ = flatten_params(img_tgt_tree)
    txt_tgt, _ = flatten_params(txt_tgt_tree)

    idx_seq = np.stack([rng.permutation(N)[:MB] for _ in range(STEPS)])
    keys = jax.random.split(jax.random.PRNGKey(0), STEPS)  # dropout off

    # ---- JAX: per-step students + grand loss + meta-grads ----
    his, hts = d.unroll(jnp.asarray(image_syn), jnp.asarray(text_syn),
                        jnp.asarray(LR_I), jnp.asarray(LR_T),
                        img_th0, txt_th0, jnp.asarray(idx_seq), keys)
    (jax_loss, _), jax_grads = jax.value_and_grad(
        d.grand_loss, argnums=(0, 1, 2, 3), has_aux=True)(
        jnp.asarray(image_syn), jnp.asarray(text_syn),
        jnp.asarray(LR_I), jnp.asarray(LR_T),
        img_th0, txt_th0, img_tgt, txt_tgt, jnp.asarray(idx_seq), keys)

    # ---- torch: the reference inner loop on ReparamModule ----
    t_img = TorchConvNetTiny()
    t_txt = TorchProjectionHead()
    load_img_weights(t_img, inner_img)
    load_txt_weights(t_txt, txt_tree0)
    rm_img = ReparamModule(t_img)
    rm_txt = ReparamModule(t_txt)

    timg_syn = torch.from_numpy(
        image_syn.transpose(0, 3, 1, 2).copy()).requires_grad_(True)
    ttxt_syn = torch.from_numpy(text_syn.copy()).requires_grad_(True)
    syn_lr_img = torch.tensor(LR_I, requires_grad=True)
    syn_lr_txt = torch.tensor(LR_T, requires_grad=True)

    img_p = [torch.from_numpy(img_tree_to_torch_flat(inner_img)
                              ).requires_grad_(True)]
    txt_p = [torch.from_numpy(txt_tree_to_torch_flat(txt_tree0)
                              ).requires_grad_(True)]
    t_img_tgt = torch.from_numpy(
        img_tree_to_torch_flat(img_tgt_tree[next(iter(img_tgt_tree))]))
    t_txt_tgt = torch.from_numpy(txt_tree_to_torch_flat(txt_tgt_tree))

    # sanity: ReparamModule's own flat layout == our converter's layout
    np.testing.assert_allclose(rm_img.flat_param.detach().numpy(),
                               img_p[0].detach().numpy(), rtol=0, atol=0)
    np.testing.assert_allclose(rm_txt.flat_param.detach().numpy(),
                               txt_p[0].detach().numpy(), rtol=0, atol=0)

    for s in range(STEPS):
        sel = torch.from_numpy(idx_seq[s].astype(np.int64))
        x = rm_img(timg_syn[sel], flat_param=img_p[-1])
        x = x / x.norm(dim=1, keepdim=True)
        y = rm_txt(ttxt_syn[sel], flat_param=txt_p[-1])
        y = y / y.norm(dim=1, keepdim=True)
        scale = (float(RAW_LOG_SCALE) if inner_scale == "fixed"
                 else syn_lr_img)
        logits = scale * x.float() @ y.float().t()
        labels = torch.arange(len(logits))
        loss = (F.cross_entropy(logits, labels)
                + F.cross_entropy(logits.t(), labels)) / 2
        gi = torch.autograd.grad(loss, img_p[-1], create_graph=True)[0]
        gt = torch.autograd.grad(loss, txt_p[-1], create_graph=True)[0]
        img_p.append(img_p[-1] - syn_lr_img * gi)
        txt_p.append(txt_p[-1] - syn_lr_txt * gt)

        # per-step student parameter parity (JAX tree -> torch flat layout)
        jtree = d._unravel_img(his[s])
        jflat = img_tree_to_torch_flat(jtree[next(iter(jtree))])
        np.testing.assert_allclose(jflat, img_p[-1].detach().numpy(),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=f"img student step {s}")
        jflat_t = txt_tree_to_torch_flat(d._unravel_txt(hts[s]))
        np.testing.assert_allclose(jflat_t, txt_p[-1].detach().numpy(),
                                   rtol=2e-4, atol=2e-6,
                                   err_msg=f"txt student step {s}")

    img_loss = (F.mse_loss(img_p[-1], t_img_tgt, reduction="sum")
                / F.mse_loss(img_p[0], t_img_tgt, reduction="sum"))
    txt_loss = (F.mse_loss(txt_p[-1], t_txt_tgt, reduction="sum")
                / F.mse_loss(txt_p[0], t_txt_tgt, reduction="sum"))
    grand = img_loss + txt_loss
    t_gi, t_gt, t_gli, t_glt = torch.autograd.grad(
        grand, [timg_syn, ttxt_syn, syn_lr_img, syn_lr_txt],
        allow_unused=False)

    # ---- grand loss + meta-gradient parity ----
    np.testing.assert_allclose(float(jax_loss), float(grand),
                               rtol=1e-4, err_msg="grand_loss")
    np.testing.assert_allclose(
        np.asarray(jax_grads[0]),
        t_gi.detach().numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-6, err_msg="d(grand)/d(image_syn)")
    np.testing.assert_allclose(np.asarray(jax_grads[1]),
                               t_gt.detach().numpy(),
                               rtol=1e-3, atol=1e-6,
                               err_msg="d(grand)/d(text_syn)")
    np.testing.assert_allclose(float(jax_grads[2]), float(t_gli),
                               rtol=1e-3, atol=1e-7,
                               err_msg="d(grand)/d(syn_lr_img)")
    np.testing.assert_allclose(float(jax_grads[3]), float(t_glt),
                               rtol=1e-3, atol=1e-7,
                               err_msg="d(grand)/d(syn_lr_txt)")
