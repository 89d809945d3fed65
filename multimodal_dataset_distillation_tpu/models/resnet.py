"""ResNet family in Flax: basic/bottleneck, BN or GN, AP variants, ImageNet-size.

Replaces the reference's ``networks.py:295-517`` (ResNet_AP family, CIFAR
ResNet, ResNetImageNet) and the timm ``resnet50`` / ``resnet18_gn`` paths
of ``ImageEncoder`` (``networks.py:674``).

GN variants ("resnet18_gn") are stateless and thus distillation-friendly;
BN variants carry a ``batch_stats`` collection (train steps pass
``mutable=['batch_stats']``).  "AP" variants replace strided convs with
stride-1 convs + average pooling (networks.py:295-396).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _make_norm(kind: str):
    def norm(channels: int, name: str):
        if kind == "batchnorm":
            return nn.BatchNorm(name=name)
        if kind == "groupnorm":
            return nn.GroupNorm(num_groups=min(32, channels), name=name)
        if kind == "instancenorm":
            return nn.GroupNorm(num_groups=channels, name=name)
        raise ValueError(kind)
    return norm


def _apply(layer, x, train: bool):
    if isinstance(layer, nn.BatchNorm):
        return layer(x, use_running_average=not train)
    return layer(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "batchnorm"
    avg_pool_down: bool = False  # "AP" variant

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        mk = _make_norm(self.norm)
        s = 1 if self.avg_pool_down else self.stride
        # explicit (1,1) padding = torchvision Conv2d(padding=1): same as
        # "SAME" at stride 1, but at stride 2 "SAME" pads (0,1) while
        # torch pads symmetrically — explicit keeps pretrained imports
        # (import_torch.resnet_params_from_torch) numerically aligned
        out = nn.Conv(self.planes, (3, 3), strides=(s, s),
                      padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv1")(x)
        out = _apply(mk(self.planes, "bn1"), out, train)
        out = jax.nn.relu(out)
        if self.avg_pool_down and self.stride != 1:
            out = nn.avg_pool(out, (2, 2), (self.stride, self.stride))
        out = nn.Conv(self.planes, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, name="conv2")(out)
        out = _apply(mk(self.planes, "bn2"), out, train)
        short = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            if self.avg_pool_down:
                short = nn.Conv(self.planes, (1, 1), use_bias=False,
                                name="shortcut_conv")(short)
                short = _apply(mk(self.planes, "shortcut_bn"), short, train)
                if self.stride != 1:
                    short = nn.avg_pool(short, (2, 2),
                                        (self.stride, self.stride))
            else:
                short = nn.Conv(self.planes, (1, 1),
                                strides=(self.stride, self.stride),
                                use_bias=False, name="shortcut_conv")(short)
                short = _apply(mk(self.planes, "shortcut_bn"), short, train)
        return jax.nn.relu(out + short)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "batchnorm"
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        mk = _make_norm(self.norm)
        out_ch = self.planes * self.expansion
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = jax.nn.relu(_apply(mk(self.planes, "bn1"), out, train))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      name="conv2")(out)
        out = jax.nn.relu(_apply(mk(self.planes, "bn2"), out, train))
        out = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(out)
        out = _apply(mk(out_ch, "bn3"), out, train)
        short = x
        if self.stride != 1 or x.shape[-1] != out_ch:
            short = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                            use_bias=False, name="shortcut_conv")(short)
            short = _apply(mk(out_ch, "shortcut_bn"), short, train)
        return jax.nn.relu(out + short)


class ResNet(nn.Module):
    """CIFAR-style (3x3 stem) or ImageNet-style (7x7 stem + maxpool)."""

    block: str                      # "basic" | "bottleneck"
    layers: Tuple[int, int, int, int]
    num_classes: int = 10
    norm: str = "batchnorm"
    imagenet_stem: bool = False
    avg_pool_down: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False, features_only: bool = False):
        mk = _make_norm(self.norm)
        if self.imagenet_stem:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name="conv1")(x)
            x = jax.nn.relu(_apply(mk(64, "bn1"), x, train))
            # torch MaxPool2d(3, 2, padding=1): symmetric pad (SAME would
            # pad (0,1) on even inputs — different window alignment)
            x = nn.max_pool(x, (3, 3), (2, 2),
                            [(1, 1), (1, 1)])
        else:
            x = nn.Conv(64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                        name="conv1")(x)
            x = jax.nn.relu(_apply(mk(64, "bn1"), x, train))
        planes = (64, 128, 256, 512)
        for si, (n, p) in enumerate(zip(self.layers, planes)):
            for bi in range(n):
                stride = (1 if si == 0 else 2) if bi == 0 else 1
                if self.block == "basic":
                    x = BasicBlock(p, stride, self.norm, self.avg_pool_down,
                                   name=f"layer{si + 1}_block{bi}")(
                                       x, train=train)
                else:
                    x = Bottleneck(p, stride, self.norm,
                                   name=f"layer{si + 1}_block{bi}")(
                                       x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        if features_only or self.num_classes == 0:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


def resnet18(num_classes: int = 10, norm: str = "batchnorm",
             imagenet_stem: bool = False) -> ResNet:
    return ResNet("basic", (2, 2, 2, 2), num_classes, norm, imagenet_stem)


def resnet18_gn(num_classes: int = 10, imagenet_stem: bool = True) -> ResNet:
    return ResNet("basic", (2, 2, 2, 2), num_classes, "groupnorm",
                  imagenet_stem)


def resnet18_ap(num_classes: int = 10, norm: str = "batchnorm") -> ResNet:
    return ResNet("basic", (2, 2, 2, 2), num_classes, norm,
                  imagenet_stem=False, avg_pool_down=True)


def resnet50(num_classes: int = 1000, norm: str = "batchnorm") -> ResNet:
    return ResNet("bottleneck", (3, 4, 6, 3), num_classes, norm,
                  imagenet_stem=True)
