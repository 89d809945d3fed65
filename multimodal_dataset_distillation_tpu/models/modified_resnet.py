"""OpenAI-CLIP ModifiedResNet + AttentionPool2d, rebuilt working in Flax.

Reference: ``networks.py:527-621`` / ``model.py:11-195`` ship these CLIP
building blocks but the file is partially dead (``build_model`` references
an undefined ``CLIP`` class, ``model.py:183``; nothing imports
``model.py`` — SURVEY.md §2.3 row 16).  Rebuilt here as a *working*
encoder: 3-conv anti-aliased stem (avg-pool before strided convs), CLIP
Bottleneck blocks, and QKV attention pooling instead of global average.

NHWC throughout; BatchNorm is the only stateful collection (uses
``batch_stats``), matching torchvision-style semantics.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ClipBottleneck(nn.Module):
    """CLIP's Bottleneck (networks.py:... / model.py:11-50): all convs
    stride 1, with avg-pool anti-aliasing before the downsample."""

    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inplanes = x.shape[-1]
        out_ch = self.planes * self.expansion
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         name=name)

        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(norm("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding="SAME", use_bias=False,
                      name="conv2")(out)
        out = jax.nn.relu(norm("bn2")(out))
        if self.stride > 1:  # anti-aliasing: avgpool then 1x1
            out = nn.avg_pool(out, (self.stride, self.stride),
                              (self.stride, self.stride))
        out = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(out)
        out = norm("bn3")(out)

        if self.stride > 1 or inplanes != out_ch:
            sc = nn.avg_pool(x, (self.stride, self.stride),
                             (self.stride, self.stride)) if self.stride > 1 else x
            sc = nn.Conv(out_ch, (1, 1), use_bias=False, name="down_conv")(sc)
            sc = norm("down_bn")(sc)
        else:
            sc = x
        return jax.nn.relu(out + sc)


class AttentionPool2d(nn.Module):
    """QKV attention pooling (networks.py:588-621): prepend the spatial
    mean as a query token, attend over (HW+1) tokens, return token 0."""

    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        mean = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)  # (B, HW+1, C)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(C ** -0.5),
                         (H * W + 1, C))
        tokens = tokens + pos[None]

        nh, hd = self.num_heads, C // self.num_heads
        q = nn.Dense(C, name="q_proj")(tokens).reshape(B, -1, nh, hd)
        k = nn.Dense(C, name="k_proj")(tokens).reshape(B, -1, nh, hd)
        v = nn.Dense(C, name="v_proj")(tokens).reshape(B, -1, nh, hd)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, -1, C)
        out = nn.Dense(self.output_dim or C, name="c_proj")(out)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP ResNet: 3-conv stem + avgpool, anti-aliased strides, attnpool."""

    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    heads: int = 32
    width: int = 64

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        w = self.width
        norm = lambda name: nn.BatchNorm(use_running_average=not train,
                                         name=name)
        x = nn.Conv(w // 2, (3, 3), strides=(2, 2), padding="SAME",
                    use_bias=False, name="conv1")(x)
        x = jax.nn.relu(norm("bn1")(x))
        x = nn.Conv(w // 2, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(x)
        x = jax.nn.relu(norm("bn2")(x))
        x = nn.Conv(w, (3, 3), padding="SAME", use_bias=False, name="conv3")(x)
        x = jax.nn.relu(norm("bn3")(x))
        x = nn.avg_pool(x, (2, 2), (2, 2))

        for li, (blocks, planes, stride) in enumerate(zip(
                self.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2))):
            for bi in range(blocks):
                x = ClipBottleneck(planes, stride if bi == 0 else 1,
                                   name=f"layer{li + 1}_{bi}")(x, train=train)

        return AttentionPool2d(w * 32, self.heads, self.output_dim,
                               name="attnpool")(x)
