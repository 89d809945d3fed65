"""Vision Transformer (ViT-Tiny/16) in Flax.

Replaces the reference's ``timm.create_model('vit_tiny_patch16_224')``
(``networks.py:668``; kept with its default 1000-class head, so the image
feature dim is 1000 — CLIPModel_full's else-branch, ``networks.py:819``).

TPU-first: the whole model is matmuls (patch embed as one big reshaped
matmul, attention via ``jnp.einsum`` lowered to the MXU); static seq len
197 pads to MXU tiles cleanly.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MlpBlock(nn.Module):
    dim: int
    hidden: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Attention(nn.Module):
    dim: int
    num_heads: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        head_dim = C // H
        qkv = nn.Dense(3 * C, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * (head_dim ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, N, C)
        out = nn.Dense(C, name="proj")(out)
        return nn.Dropout(self.drop)(out, deterministic=deterministic)


class EncoderBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        y = nn.LayerNorm(name="norm1")(x)
        x = x + Attention(self.dim, self.num_heads, self.drop, name="attn")(
            y, deterministic=deterministic)
        y = nn.LayerNorm(name="norm2")(x)
        x = x + MlpBlock(self.dim, int(self.dim * self.mlp_ratio), self.drop,
                         name="mlp")(y, deterministic=deterministic)
        return x


class VisionTransformer(nn.Module):
    patch_size: int = 16
    dim: int = 192
    depth: int = 12
    num_heads: int = 3
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    drop: float = 0.0
    image_size: int = 224

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True,
                 features_only: bool = False):
        B = x.shape[0]
        x = nn.Conv(self.dim, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(x)
        x = x.reshape(B, -1, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        pos = self.param("pos_embed",
                         nn.initializers.normal(0.02), (1, x.shape[1], self.dim))
        x = x + pos
        for i in range(self.depth):
            x = EncoderBlock(self.dim, self.num_heads, self.mlp_ratio,
                             self.drop, name=f"block{i}")(
                                 x, deterministic=deterministic)
        x = nn.LayerNorm(name="norm")(x)
        feats = x[:, 0]  # CLS token
        if features_only or self.num_classes == 0:
            return feats
        return nn.Dense(self.num_classes, name="head")(feats)


def vit_tiny_patch16_224(num_classes: int = 1000) -> VisionTransformer:
    return VisionTransformer(patch_size=16, dim=192, depth=12, num_heads=3,
                             num_classes=num_classes)
