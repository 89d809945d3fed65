"""Shared Flax building blocks for the model zoo.

TPU-first notes: all convs lower to XLA convolutions tiled onto the MXU;
weight standardization is folded into the conv weight at apply time (one
cheap VPU pass over the kernel, fused by XLA).  NHWC layout throughout —
the native TPU layout.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import fused_jvp
from ..ops import pallas_gconv
from ..ops import s2d as _s2d

# Expected gain of x -> act(x) under x~N(0,1); used by NF nets to preserve
# unit variance without normalization layers ("normalizer-free" recipe,
# Brock et al. 2021).  Values match the published constants.
NONLIN_GAMMA = {
    "identity": 1.0,
    "celu": 1.270926833152771,
    "elu": 1.2716004848480225,
    "gelu": 1.7015043497085571,
    "leaky_relu": 1.70590341091156,
    "log_sigmoid": 1.9193484783172607,
    "log_softmax": 1.0002083778381348,
    "relu": 1.7139588594436646,
    "relu6": 1.7131484746932983,
    "selu": 1.0008515119552612,
    "sigmoid": 4.803835391998291,
    "silu": 1.7881293296813965,
    "softsign": 2.338853120803833,
    "softplus": 1.9203323125839233,
    "tanh": 1.5939117670059204,
}

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "sigmoid": jax.nn.sigmoid,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def gamma_act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Variance-preserving activation: gamma * act(x)."""
    act = ACTIVATIONS[name]
    gamma = NONLIN_GAMMA[name if name != "leakyrelu" else "leaky_relu"]
    return lambda x: act(x) * gamma


class WSConv(nn.Module):
    """Scaled weight-standardized conv (NF-nets' ScaledStdConv2d).

    weight' = gain * gamma * (w - mean(w)) / sqrt((var(w) + eps) * fan_in)
    with per-output-channel statistics and learnable per-channel ``gain``.
    The eps placement matches timm's ``ScaledStdConv2d`` exactly (the
    reference builds these towers from timm, ``networks.py:666``): timm
    standardizes via ``F.batch_norm`` (i.e. ``/sqrt(var+eps)``) and folds
    ``fan_in**-0.5`` into the gain — NOT the DM-haiku ``max(var*fan_in,
    eps)`` convention.  ``gamma`` rides on the variance-preserving
    activations (timm's ``act_with_gamma``), so it defaults to 1 here.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    feature_group_count: int = 1
    use_bias: bool = True
    gamma: float = 1.0
    eps: float = 1e-6
    dtype: Any = None
    # Space-to-depth mode (ops/s2d.py): when s2d_in > 1 the input is
    # expected in s2d(s2d_in) layout and the output is produced in
    # s2d(s2d_out) layout; `strides`/`kernel_size` keep their ORIGINAL
    # grid meaning and the parameter tree is unchanged — the
    # standardized kernel is rearranged at apply time (exact math).
    s2d_in: int = 1
    s2d_out: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        if self.s2d_in > 1:
            in_ch = in_ch // (self.s2d_in * self.s2d_in)
        kshape = (*self.kernel_size, in_ch // self.feature_group_count,
                  self.features)
        w = self.param("kernel", nn.initializers.he_normal(), kshape, jnp.float32)
        gain = self.param("gain", nn.initializers.ones, (self.features,), jnp.float32)
        fan_in = kshape[0] * kshape[1] * kshape[2]
        mean = jnp.mean(w, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(w, axis=(0, 1, 2), keepdims=True)
        scale = jax.lax.rsqrt((var + self.eps) * fan_in)
        w = (w - mean) * scale * (gain * self.gamma)[None, None, None, :]
        groups = self.feature_group_count
        if self.dtype is not None:
            w = w.astype(self.dtype)
            x = x.astype(self.dtype)
        if self.s2d_in > 1:
            assert groups == 1, "s2d mode is for the (ungrouped) stem convs"
            assert self.padding == "SAME" and self.strides[0] == self.strides[1]
            w2 = _s2d.rearrange_kernel(
                w, self.strides[0], self.s2d_in, self.s2d_out)
            pl, ph = _s2d.block_padding(
                self.kernel_size[0], self.strides[0], self.s2d_in,
                self.s2d_out)
            y = jax.lax.conv_general_dilated(
                x, w2,
                window_strides=(1, 1),
                padding=((pl, ph), (pl, ph)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            if self.use_bias:
                b = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
                bt = jnp.tile(b, self.s2d_out * self.s2d_out)
                y = y + bt.astype(y.dtype)
            return y
        if (groups > 1 and self.kernel_size == (3, 3)
                and self.strides == (1, 1) and self.padding == "SAME"
                and pallas_gconv.enabled()):
            # grouped 3x3s are the one conv class XLA runs far off
            # roofline (rank-5 grouped lowering, DESIGN.md §10.1); the
            # pallas im2col kernel is exact-same-math and arbitrary-order
            # differentiable (ops/pallas_gconv.py)
            y = pallas_gconv.gconv3x3(x, w, groups)
        elif fused_jvp.active():
            # meta-backward tangent trace: merged-tangent conv rule
            # (one conv for the share-x {primal, weight-tangent} pair;
            # ops/fused_jvp.py) — only active while the distiller traces
            # the inner jvp of the forward-HVP backward
            y = fused_jvp.conv(x, w, self.strides, self.padding, groups)
        else:
            y = jax.lax.conv_general_dilated(
                x, w,
                window_strides=self.strides,
                padding=self.padding,
                feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class SqueezeExcite(nn.Module):
    """SE attention block (used by NFNet-L0 with rd_ratio=0.25)."""

    features: int
    rd_ratio: float = 0.25
    rd_divisor: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        rd = max(int(self.features * self.rd_ratio), self.rd_divisor)
        rd = int((rd + self.rd_divisor / 2) // self.rd_divisor * self.rd_divisor)
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(rd, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Dense(self.features, name="fc2")(s)
        s = jax.nn.sigmoid(s)
        return x * s[:, None, None, :]


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: Optional[bool] = None) -> jnp.ndarray:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
        return x * mask / keep


def avg_pool(x: jnp.ndarray, window: int, stride: int,
             padding: str = "VALID") -> jnp.ndarray:
    return nn.avg_pool(x, (window, window), (stride, stride), padding)


def max_pool(x: jnp.ndarray, window: int, stride: int,
             padding: str = "VALID") -> jnp.ndarray:
    return nn.max_pool(x, (window, window), (stride, stride), padding)
