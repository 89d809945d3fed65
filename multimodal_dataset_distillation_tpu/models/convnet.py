"""Legacy classification zoo (DatasetCondensation heritage) in Flax.

Flax re-designs of the reference's small-model zoo (``networks.py:27-289``):
MLP, ConvNet/ConvNetGAP with width/depth/act/norm/pool variants, LeNet,
AlexNet, and the VGG family.  These sit behind the ``get_network`` surface
(``utils.py:148-246``) and the eval-mode pools (``utils.py:336-360``); they
are not on the main VL path but are part of the public capability surface.

Norm options: "instancenorm" (the zoo default) / "groupnorm" / "layernorm"
are stateless; "batchnorm" uses a ``batch_stats`` collection (callers pass
``mutable=['batch_stats']`` during training).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_dataset_distillation_tpu.models.layers import ACTIVATIONS


def _norm(kind: str, channels: int, name: str):
    # epsilon=1e-5 everywhere: torch's GroupNorm/LayerNorm default, which
    # is what the reference zoo uses (networks.py:79-97); flax defaults
    # to 1e-6 — matched for cross-framework numerics parity
    if kind == "instancenorm":
        return nn.GroupNorm(num_groups=channels, epsilon=1e-5, name=name)
    if kind == "groupnorm":
        return nn.GroupNorm(num_groups=min(32, channels), epsilon=1e-5,
                            name=name)
    if kind == "layernorm":
        return nn.LayerNorm(epsilon=1e-5, name=name)
    if kind == "batchnorm":
        return nn.BatchNorm(name=name)
    if kind == "none":
        return None
    raise ValueError(f"unknown norm: {kind}")


def _apply_norm(layer, x, train: bool):
    if layer is None:
        return x
    if isinstance(layer, nn.BatchNorm):
        return layer(x, use_running_average=not train)
    return layer(x)


def _pool(kind: str, x):
    if kind == "avgpooling":
        return nn.avg_pool(x, (2, 2), (2, 2))
    if kind == "maxpooling":
        return nn.max_pool(x, (2, 2), (2, 2))
    if kind == "none":
        return x
    raise ValueError(f"unknown pooling: {kind}")


class MLP(nn.Module):
    """networks.py:27-41 — 2 hidden layers of 128, ReLU."""

    num_classes: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(128, name="fc_1")(x))
        x = jax.nn.relu(nn.Dense(128, name="fc_2")(x))
        return nn.Dense(self.num_classes, name="fc_3")(x)


class ConvNet(nn.Module):
    """networks.py:44-114 — D blocks of [3x3 conv W, norm, act, pool]."""

    num_classes: int
    net_width: int = 128
    net_depth: int = 3
    net_act: str = "relu"
    net_norm: str = "instancenorm"
    net_pooling: str = "avgpooling"
    gap: bool = False  # ConvNetGAP (networks.py:117-188)

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        act = ACTIVATIONS[self.net_act]
        for d in range(self.net_depth):
            x = nn.Conv(self.net_width, (3, 3), padding="SAME",
                        name=f"conv{d}")(x)
            x = _apply_norm(_norm(self.net_norm, self.net_width, f"norm{d}"),
                            x, train)
            x = act(x)
            if self.net_pooling != "none":
                x = _pool(self.net_pooling, x)
        if self.gap:
            x = jnp.mean(x, axis=(1, 2))
        else:
            x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="classifier")(x)


class LeNet(nn.Module):
    """networks.py:191-214."""

    num_classes: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = jax.nn.relu(nn.Conv(6, (5, 5), padding=[(2, 2), (2, 2)],
                                name="conv1")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = jax.nn.relu(nn.Conv(16, (5, 5), padding="VALID", name="conv2")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        x = jax.nn.relu(nn.Dense(120, name="fc_1")(x))
        x = jax.nn.relu(nn.Dense(84, name="fc_2")(x))
        return nn.Dense(self.num_classes, name="fc_3")(x)


class AlexNet(nn.Module):
    """networks.py:217-249 (CIFAR-sized AlexNet)."""

    num_classes: int

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = jax.nn.relu(nn.Conv(128, (5, 5), strides=(1, 1),
                                padding=[(4, 4), (4, 4)], name="conv1")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = jax.nn.relu(nn.Conv(192, (5, 5), padding=[(2, 2), (2, 2)],
                                name="conv2")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = jax.nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv3")(x))
        x = jax.nn.relu(nn.Conv(192, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv4")(x))
        x = jax.nn.relu(nn.Conv(192, (3, 3), padding=[(1, 1), (1, 1)],
                                name="conv5")(x))
        x = nn.max_pool(x, (2, 2), (2, 2))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="fc")(x)


_VGG_CFG = {
    "VGG11": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "VGG13": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
              512, 512, "M"],
    "VGG16": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
              "M", 512, 512, 512, "M"],
    "VGG19": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512,
              512, 512, "M", 512, 512, 512, 512, "M"],
}


class VGG(nn.Module):
    """networks.py:252-289; norm 'instancenorm' default, 'batchnorm' = BN variant."""

    vgg_name: str
    num_classes: int
    norm: str = "instancenorm"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        i = 0
        for v in _VGG_CFG[self.vgg_name]:
            if v == "M":
                x = nn.max_pool(x, (2, 2), (2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", name=f"conv{i}")(x)
                x = _apply_norm(_norm(self.norm, v, f"norm{i}"), x, train)
                x = jax.nn.relu(x)
                i += 1
        x = nn.avg_pool(x, (1, 1), (1, 1))
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.num_classes, name="classifier")(x)
