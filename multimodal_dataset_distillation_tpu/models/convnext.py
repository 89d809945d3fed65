"""ConvNeXt-Tiny in Flax.

Reference: ``CLIPModel_full``'s dim table names ``convnext`` -> 640
(``networks.py:816-817``) and ``ImageEncoder``'s generic branch would
build it via ``timm.create_model(name, num_classes=0, global_pool='avg')``
(``networks.py:674``) — whose true feature dim is 768 for convnext_tiny,
so the reference's 640 is a latent shape bug (the projection target would
not match the image features).  Here the registry carries the true 768.

TPU notes: depthwise 7x7 convs lower to XLA depthwise convolutions; the
inverted-bottleneck MLPs are plain matmuls on the MXU; LayerNorm over the
channel dim in NHWC is the natural layout.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding="SAME",
                    feature_group_count=self.dim, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h)
        h = nn.Dense(4 * self.dim, name="pwconv1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="pwconv2")(h)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + gamma * h


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 0   # 0 = pooled features

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si == 0:
                x = nn.Conv(dim, (4, 4), strides=(4, 4), name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{si}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2),
                            name=f"down{si}_conv")(x)
            for bi in range(depth):
                x = ConvNeXtBlock(dim, name=f"stage{si}_block{bi}")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, name="head_norm")(x)
        if self.num_classes:
            x = nn.Dense(self.num_classes, name="head")(x)
        return x


def convnext_tiny(num_classes: int = 0) -> ConvNeXt:
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                    num_classes=num_classes)
