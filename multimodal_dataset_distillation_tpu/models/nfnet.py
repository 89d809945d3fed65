"""Normalizer-Free networks (NFNet-L0, NF-ResNet50, NF-RegNet-B1) in Flax.

From-scratch TPU-native implementations of the reference's normalizer-free
image encoders (``networks.py:666-672`` builds them via timm:
``nfnet_l0``, ``nf_resnet50``, ``nf_regnet_b1``).  Normalizer-free
backbones are the backbone family that makes trajectory matching work —
no BatchNorm buffers to confound parameter matching (SURVEY.md §6 Table C;
``reparam_module.py:67-74`` excludes buffers from the flat param) — and
they are also ideal for this framework because they are *stateless*: a
pure ``apply(params, x)`` with no mutable collections, so the distillation
inner loop is a clean ``lax.scan`` over a flat parameter vector.

Recipe (Brock et al., "High-Performance Large-Scale Image Recognition
Without Normalization", 2021):
  * scaled weight-standardized convs (:class:`~.layers.WSConv`)
  * variance-preserving activations ``gamma * act(x)``
  * residual branches scaled by ``beta = 1/expected_std`` on entry and
    ``alpha`` on exit, with ``expected_std`` bookkeeping across blocks
  * SE attention, doubled — after conv3 on NFNet-style blocks (timm
    ``attn_last``), MID-block on the expanded width for reg-style
    models (timm ``attn``; our ``se_mid``)
  * optional skip-init gain (zero-init scalar per block)

All shapes NHWC; convs/matmuls sized for the MXU (channel counts are
multiples of 8/64; feature dims 2304/2048 tile cleanly onto 128 lanes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from multimodal_dataset_distillation_tpu.models.layers import (
    DropPath,
    SqueezeExcite,
    WSConv,
    gamma_act,
    NONLIN_GAMMA,
)
from multimodal_dataset_distillation_tpu.ops import s2d


def make_divisible(v: float, divisor: int = 8,
                   round_limit: float = 0.9) -> int:
    """timm's channel rounding (timm.models.layers.make_divisible): round
    to the nearest multiple of ``divisor``, bumping up when that would
    fall below ``round_limit * v``.  Used everywhere timm derives widths,
    so faithful ports must use it too (plain ``round`` diverges, e.g.
    nf_regnet_b1 stage-3 first-block mid 180 -> timm 184 vs round 176)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < round_limit * v:
        new_v += divisor
    return new_v


@dataclasses.dataclass(frozen=True)
class NfConfig:
    depths: Tuple[int, ...]
    channels: Tuple[int, ...]
    alpha: float = 0.2
    stem_type: str = "deep_quad"          # deep_quad | 7x7_pool | 3x3
    stem_chs: int = 128
    group_size: Optional[int] = None      # channels per group in 3x3 convs
    bottle_ratio: float = 0.25
    extra_conv: bool = False              # second grouped 3x3 (NFNet blocks)
    num_features: int = 0                 # final 1x1 conv width (0 = none)
    act: str = "silu"
    attn_rd_ratio: float = 0.0            # 0 disables SE
    attn_gain: float = 2.0
    skipinit: bool = True
    drop_path_rate: float = 0.0
    num_classes: int = 0                  # 0 = feature extractor (pooled)
    drop_rate: float = 0.0
    # timm NfCfg "reg" (EfficientNet-style RegNet) semantics: mid width
    # derives from the block INPUT (x bottle_ratio, first block of each
    # stage only — later blocks use ratio 1.0), and SE sits MID-BLOCK on
    # the expanded width (timm's ``attn``) instead of after conv3
    # (``attn_last``)
    reg: bool = False
    width_factor: float = 1.0             # timm NfCfg.width_factor
    ch_div: int = 8                       # timm NfCfg.ch_div


# Flagship: timm `nfnet_l0` — depths (1,2,6,3), channels (256,512,1536,1536),
# deep_quad stem, group 64, bottle 0.25, extra conv, SE rd 0.25, SiLU,
# final features 1536*1.5 = 2304 (matches image_embedding=2304,
# networks.py:812).
NFNET_L0 = NfConfig(
    depths=(1, 2, 6, 3), channels=(256, 512, 1536, 1536),
    stem_type="deep_quad", stem_chs=128, group_size=64, bottle_ratio=0.25,
    extra_conv=True, num_features=2304, act="silu", attn_rd_ratio=0.25,
    skipinit=True, drop_path_rate=0.1,
)

# timm `nf_resnet50` — pre-act normalizer-free ResNet50, ReLU, no attention,
# 7x7+pool stem, plain (ungrouped) 3x3, classifier kept (reference loads it
# pretrained with the default 1000-class head, networks.py:670).
NF_RESNET50 = NfConfig(
    depths=(3, 4, 6, 3), channels=(256, 512, 1024, 2048),
    stem_type="7x7_pool", stem_chs=64, group_size=None, bottle_ratio=0.25,
    extra_conv=False, num_features=0, act="relu", attn_rd_ratio=0.0,
    skipinit=False, num_classes=1000,
)

# timm `nf_regnet_b1` — EfficientNet-style inverted bottleneck RegNet
# (timm `_nfreg_cfg(depths=(2,4,7,7))`): nominal channels (48,104,208,440)
# x width_factor 0.75 -> effective (40,80,160,328); 3x3/s2 stem 40->32
# (so stage 0 strides, stem_stride being 2); first block of each stage
# expands from the INPUT width x2.25, later blocks x1.0; SE (rd 0.5 of
# the expanded width) applied MID-block; final 1x1 conv
# make_divisible(0.75*1280)=960; 1000-class head (networks.py:672 keeps
# the classifier).
NF_REGNET_B1 = NfConfig(
    depths=(2, 4, 7, 7), channels=(48, 104, 208, 440),
    stem_type="3x3", stem_chs=40, group_size=8, bottle_ratio=2.25,
    extra_conv=False, num_features=960, act="silu", attn_rd_ratio=0.5,
    skipinit=False, num_classes=1000, reg=True, width_factor=0.75,
)


class NfBlock(nn.Module):
    cfg: NfConfig
    out_chs: int
    stride: int
    beta: float
    transition: bool
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        act = gamma_act(cfg.act)
        gamma = 1.0  # WS gamma folded via gamma_act on the activations

        # timm NormFreeBlock: reg models derive mid from the block INPUT
        # width (x2.25 inverted bottleneck, EVERY block — validated by
        # reproducing timm nf_regnet_b1's 10.22M param count exactly),
        # others from the output; both via make_divisible
        ref_chs = int(x.shape[-1]) if cfg.reg else self.out_chs
        mid = make_divisible(ref_chs * cfg.bottle_ratio, cfg.ch_div)
        if cfg.group_size:
            groups = max(1, mid // cfg.group_size)
            if cfg.group_size % cfg.ch_div == 0:
                mid = groups * cfg.group_size
        else:
            groups = 1

        out = act(x) * self.beta
        if self.transition:
            sc = out
            if self.stride > 1:
                sc = nn.avg_pool(sc, (2, 2), (self.stride, self.stride), "SAME")
            shortcut = WSConv(self.out_chs, (1, 1), name="downsample_conv")(sc)
        else:
            shortcut = x

        out = WSConv(mid, (1, 1), name="conv1")(out)
        out = act(out)
        out = WSConv(mid, (3, 3), strides=(self.stride, self.stride),
                     feature_group_count=groups, name="conv2")(out)
        if cfg.extra_conv:
            out = act(out)
            out = WSConv(mid, (3, 3), feature_group_count=groups,
                         name="conv2b")(out)
        if cfg.reg and cfg.attn_rd_ratio > 0:
            # timm ``attn``: SE mid-block on the expanded width (reg
            # models), registered between conv2(b) and conv3 — named
            # se_mid so codecs/importers can tell the position apart
            out = cfg.attn_gain * SqueezeExcite(
                mid, rd_ratio=cfg.attn_rd_ratio, name="se_mid")(out)
        out = act(out)
        out = WSConv(self.out_chs, (1, 1), name="conv3")(out)
        if not cfg.reg and cfg.attn_rd_ratio > 0:
            # timm ``attn_last``: SE after conv3 (NFNet-style blocks)
            out = cfg.attn_gain * SqueezeExcite(
                self.out_chs, rd_ratio=cfg.attn_rd_ratio, name="se")(out)
        out = DropPath(self.drop_path, name="drop_path")(
            out, deterministic=deterministic)
        if cfg.skipinit:
            g = self.param("skipinit_gain", nn.initializers.zeros, ())
            out = out * g
        return out * cfg.alpha + shortcut


class NormFreeNet(nn.Module):
    """Generic normalizer-free network over :class:`NfConfig`."""

    cfg: NfConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 features_only: bool = False) -> jnp.ndarray:
        cfg = self.cfg
        act = gamma_act(cfg.act)
        stem_chs = make_divisible(cfg.stem_chs * cfg.width_factor, cfg.ch_div)

        # ---- stem ----
        if cfg.stem_type == "deep_quad":
            c = stem_chs
            if s2d.enabled() and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0:
                # space-to-depth stem (ops/s2d.py): exact-math layout
                # rewrite — all four convs run on the H/4 block grid with
                # 4x/16x channels, defeating the batch-minor lane padding
                # XLA picks for 16-64-channel 112^2 tensors (DESIGN.md
                # §10.1 "stem" class).  Same params, same outputs; acts
                # are elementwise so they commute with the layout.
                x = s2d.space_to_depth(x, 4)
                x = WSConv(c // 8, (3, 3), strides=(2, 2), s2d_in=4,
                           s2d_out=2, name="stem_conv1")(x)
                x = act(x)
                x = WSConv(c // 4, (3, 3), s2d_in=2, s2d_out=2,
                           name="stem_conv2")(x)
                x = act(x)
                x = WSConv(c // 2, (3, 3), s2d_in=2, s2d_out=2,
                           name="stem_conv3")(x)
                x = act(x)
                x = WSConv(c, (3, 3), strides=(2, 2), s2d_in=2, s2d_out=1,
                           name="stem_conv4")(x)
            else:
                x = WSConv(c // 8, (3, 3), strides=(2, 2),
                           name="stem_conv1")(x)
                x = act(x)
                x = WSConv(c // 4, (3, 3), name="stem_conv2")(x)
                x = act(x)
                x = WSConv(c // 2, (3, 3), name="stem_conv3")(x)
                x = act(x)
                x = WSConv(c, (3, 3), strides=(2, 2), name="stem_conv4")(x)
        elif cfg.stem_type == "7x7_pool":
            if s2d.enabled() and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                # same lane-padding economics as deep_quad, one conv:
                # the 3->64ch 7x7/s2 is the lone narrow-channel kernel
                # here (the max_pool after it already sees 64 channels),
                # so run it s2d(2)-in -> native-layout out at H/2
                x = s2d.space_to_depth(x, 2)
                x = WSConv(stem_chs, (7, 7), strides=(2, 2), s2d_in=2,
                           s2d_out=1, name="stem_conv")(x)
            else:
                x = WSConv(stem_chs, (7, 7), strides=(2, 2),
                           name="stem_conv")(x)
            x = act(x)
            x = nn.max_pool(x, (3, 3), (2, 2), "SAME")
        elif cfg.stem_type == "3x3":
            if s2d.enabled() and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                x = s2d.space_to_depth(x, 2)
                x = WSConv(stem_chs, (3, 3), strides=(2, 2), s2d_in=2,
                           s2d_out=1, name="stem_conv")(x)
            else:
                x = WSConv(stem_chs, (3, 3), strides=(2, 2),
                           name="stem_conv")(x)
        else:
            raise ValueError(cfg.stem_type)
        # stage boundaries are tagged for jax.checkpoint's
        # save_only_these_names policy (cfg.fr_remat="names" in the
        # distillation meta-backward): identity unless a surrounding
        # jax.checkpoint selects them as the only saved activations
        x = checkpoint_name(x, "nf_stem_out")

        # ---- stages ----
        # 3x3 stems downsample only 2x, so stage 0 strides too (timm:
        # ``stride = 1 if stage_idx == 0 and stem_stride > 2 else 2``)
        stem_stride = 2 if cfg.stem_type == "3x3" else 4
        total_blocks = sum(cfg.depths)
        block_idx = 0
        expected_std = 1.0
        for si, (depth, chs) in enumerate(zip(cfg.depths, cfg.channels)):
            out_chs = make_divisible(chs * cfg.width_factor, cfg.ch_div)
            stride = 1 if si == 0 and stem_stride > 2 else 2
            for bi in range(depth):
                beta = 1.0 / expected_std
                transition = bi == 0
                dpr = cfg.drop_path_rate * block_idx / max(total_blocks - 1, 1)
                x = NfBlock(cfg, out_chs, stride if bi == 0 else 1, beta,
                            transition, drop_path=dpr,
                            name=f"stage{si}_block{bi}")(
                                x, deterministic=deterministic)
                if transition:
                    expected_std = 1.0
                expected_std = (expected_std ** 2 + cfg.alpha ** 2) ** 0.5
                block_idx += 1
                x = checkpoint_name(x, f"nf_stage{si}_block{bi}_out")

        # ---- head ----
        if cfg.num_features:
            x = WSConv(cfg.num_features, (1, 1), name="final_conv")(x)
            x = act(x)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if features_only or cfg.num_classes == 0:
            return x
        x = nn.Dropout(cfg.drop_rate)(x, deterministic=deterministic)
        return nn.Dense(cfg.num_classes, name="head")(x)


# CI-sized NFNet: same block anatomy as nfnet_l0 (deep_quad stem, grouped
# 3x3 + extra conv, SE, skipinit, silu) at toy width/depth — used by the
# NFNet-architecture reference-parity harness and CPU perf-knob tests.
NF_TINY = NfConfig(
    depths=(1, 2), channels=(32, 64),
    stem_type="deep_quad", stem_chs=16, group_size=8, bottle_ratio=0.5,
    extra_conv=True, num_features=128, act="silu", attn_rd_ratio=0.25,
    skipinit=True, drop_path_rate=0.0,
)


def nfnet_l0(num_classes: int = 0) -> NormFreeNet:
    return NormFreeNet(dataclasses.replace(NFNET_L0, num_classes=num_classes))


def nf_tiny(num_classes: int = 0) -> NormFreeNet:
    return NormFreeNet(dataclasses.replace(NF_TINY, num_classes=num_classes))


def nf_resnet50(num_classes: int = 1000) -> NormFreeNet:
    return NormFreeNet(dataclasses.replace(NF_RESNET50, num_classes=num_classes))


def nf_regnet_b1(num_classes: int = 1000) -> NormFreeNet:
    return NormFreeNet(dataclasses.replace(
        NF_REGNET_B1, num_classes=num_classes))
