"""NFNet forward parity: Flax NormFreeNet vs a minimal pure-torch mirror.

Offline stand-in for real timm-weight validation (VERDICT round-1 item 7;
the reference builds its towers via timm, ``networks.py:666``).  The torch
mirror implements timm's published NFNet semantics from scratch —
``ScaledStdConv2d`` weight standardization ``gain * (w - mean) /
sqrt((var + eps) * fan_in)``, TF-SAME padding, ``act_with_gamma``
variance-preserving activations, beta/alpha residual bookkeeping, SE with
gain x2, zero-init skipinit — and is fed our Flax parameters through
``nfnet_params_to_timm`` (the timm-naming exporter), so a failure
pinpoints either a semantic divergence in ``models/nfnet.py``/``layers.py``
or a mapping bug in ``models/import_torch.py``.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_dataset_distillation_tpu.models.import_torch import (  # noqa: E402
    nfnet_params_from_timm,
    nfnet_params_to_timm,
)
from multimodal_dataset_distillation_tpu.models.layers import NONLIN_GAMMA  # noqa: E402
from multimodal_dataset_distillation_tpu.models.nfnet import (  # noqa: E402
    NFNET_L0,
    NfConfig,
    NormFreeNet,
)

# structurally complete but CI-sized: deep_quad stem, grouped 3x3 +
# extra conv, SE, skipinit, final_conv — every L0 feature at toy width
NF_TINY = NfConfig(
    depths=(1, 2), channels=(32, 64), stem_type="deep_quad", stem_chs=16,
    group_size=8, bottle_ratio=0.25, extra_conv=True, num_features=96,
    act="silu", attn_rd_ratio=0.25, skipinit=True, drop_path_rate=0.0,
    num_classes=0)


def _tf_same_pad(x, k, s):
    ih, iw = x.shape[-2:]
    pad_h = max((-(-ih // s) - 1) * s + k - ih, 0)
    pad_w = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, (pad_w // 2, pad_w - pad_w // 2,
                     pad_h // 2, pad_h - pad_h // 2))


def _std_conv(x, sd, prefix, stride=1, groups=1):
    """timm ScaledStdConv2dSame forward from a state-dict entry."""
    w = sd[prefix + ".weight"]
    gain = sd[prefix + ".gain"].view(-1, 1)
    o = w.shape[0]
    flat = w.reshape(o, -1)
    fan_in = flat.shape[1]
    mean = flat.mean(1, keepdim=True)
    var = flat.var(1, unbiased=False, keepdim=True)
    w = ((flat - mean) / ((var + 1e-6) * fan_in).sqrt() * gain).view_as(w)
    x = _tf_same_pad(x, w.shape[-1], stride)
    return F.conv2d(x, w, sd.get(prefix + ".bias"), stride=stride,
                    groups=groups)


def _torch_forward(x, sd, cfg: NfConfig):
    """Pure-torch NormFreeNet forward (timm semantics) over NfConfig."""
    gamma = NONLIN_GAMMA[cfg.act]
    act_fn = {"silu": F.silu, "relu": F.relu}[cfg.act]

    def act(t):
        return act_fn(t) * gamma

    # ---- stem ----
    if cfg.stem_type == "deep_quad":
        x = _std_conv(x, sd, "stem.conv1", stride=2)
        x = act(x)
        x = _std_conv(x, sd, "stem.conv2")
        x = act(x)
        x = _std_conv(x, sd, "stem.conv3")
        x = act(x)
        x = _std_conv(x, sd, "stem.conv4", stride=2)
    else:
        raise NotImplementedError(cfg.stem_type)

    expected_std = 1.0
    for si, (depth, out_chs) in enumerate(zip(cfg.depths, cfg.channels)):
        for bi in range(depth):
            p = f"stages.{si}.{bi}"
            beta = 1.0 / expected_std
            stride = (1 if si == 0 else 2) if bi == 0 else 1
            transition = bi == 0

            mid = int(round(out_chs * cfg.bottle_ratio))
            groups = max(1, mid // cfg.group_size) if cfg.group_size else 1

            out = act(x) * beta
            if transition:
                sc = out
                if stride > 1:
                    sc = F.avg_pool2d(sc, 2, stride)
                shortcut = _std_conv(sc, sd, p + ".downsample.conv")
            else:
                shortcut = x
            out = _std_conv(out, sd, p + ".conv1")
            out = act(out)
            out = _std_conv(out, sd, p + ".conv2", stride=stride,
                            groups=groups)
            if cfg.extra_conv:
                out = act(out)
                out = _std_conv(out, sd, p + ".conv2b", groups=groups)
            out = act(out)
            out = _std_conv(out, sd, p + ".conv3")
            if cfg.attn_rd_ratio > 0:
                s = out.mean(dim=(2, 3))
                s = F.relu(F.linear(s, sd[p + ".attn_last.fc1.weight"][:, :, 0, 0],
                                    sd[p + ".attn_last.fc1.bias"]))
                s = torch.sigmoid(
                    F.linear(s, sd[p + ".attn_last.fc2.weight"][:, :, 0, 0],
                             sd[p + ".attn_last.fc2.bias"]))
                out = cfg.attn_gain * (out * s[:, :, None, None])
            if cfg.skipinit:
                out = out * sd[p + ".skipinit_gain"]
            x = out * cfg.alpha + shortcut

            if transition:
                expected_std = 1.0
            expected_std = (expected_std ** 2 + cfg.alpha ** 2) ** 0.5

    if cfg.num_features:
        x = _std_conv(x, sd, "final_conv")
        x = act(x)
    return x.mean(dim=(2, 3))


def _run_parity(cfg: NfConfig, size: int, seed: int = 0,
                randomize_gains: bool = True):
    model = NormFreeNet(cfg)
    rng = np.random.RandomState(seed)
    x = rng.randn(2, size, size, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(x))["params"]

    if randomize_gains:
        # perturb gains/skipinit away from init (1/0) so the test
        # actually exercises gain placement and skipinit multiply
        def jiggle(path, leaf):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name in ("gain", "skipinit_gain"):
                return np.asarray(np.asarray(leaf)
                                  + 0.3 * rng.randn(*np.shape(leaf)),
                                  np.float32)
            return leaf
        params = jax.tree_util.tree_map_with_path(jiggle, params)

    jax_out = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                     deterministic=True))

    sd_np = nfnet_params_to_timm(params, depths=cfg.depths,
                                 stem_convs=4 if cfg.stem_type == "deep_quad"
                                 else 1)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).astype(np.float32))
          for k, v in sd_np.items()}
    # re-shape gain to timm's (O,1,1,1) on-disk layout handled inside
    torch_out = _torch_forward(
        torch.from_numpy(x.transpose(0, 3, 1, 2).copy()), sd, cfg).numpy()

    np.testing.assert_allclose(jax_out, torch_out, rtol=2e-4, atol=2e-5)

    # and the import direction round-trips through the same state dict
    re_params = nfnet_params_from_timm(
        sd, depths=cfg.depths,
        stem_convs=4 if cfg.stem_type == "deep_quad" else 1)
    re_out = np.asarray(model.apply({"params": re_params}, jnp.asarray(x),
                                    deterministic=True))
    np.testing.assert_allclose(jax_out, re_out, rtol=1e-6, atol=1e-7)


def test_nf_tiny_mirror_parity():
    with torch.no_grad():
        _run_parity(NF_TINY, size=32)


def test_nfnet_l0_mirror_parity():
    """The flagship config itself (stem + all 12 blocks + head) at a
    reduced image size — the exact L0 channel/group/SE dims."""
    cfg = dataclasses.replace(NFNET_L0, drop_path_rate=0.0)
    with torch.no_grad():
        _run_parity(cfg, size=64)
