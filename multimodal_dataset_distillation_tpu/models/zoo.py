"""Model registry: image encoders + the legacy ``get_network`` surface.

Replaces the reference's ``ImageEncoder`` timm dispatch
(``networks.py:648-688``) and ``utils.get_network`` (``utils.py:148-246``).

Feature dims follow the reference's conventions: ``nfnet`` is built
headless (2304 features; ``networks.py:666``), while ``vit`` /
``nf_resnet50`` / ``nf_regnet`` keep their 1000-class heads
(``networks.py:668-672``), and CLIPModel_full's dim table
(``networks.py:810-819``) governs the projection target.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodal_dataset_distillation_tpu.models import convnet as _convnet
from multimodal_dataset_distillation_tpu.models import nfnet as _nfnet
from multimodal_dataset_distillation_tpu.models import resnet as _resnet
from multimodal_dataset_distillation_tpu.models import vit as _vit

# image-tower output dims (what the contrastive loss actually sees)
IMAGE_FEATURE_DIMS = {
    "nfnet": 2304,
    "nfnet_transfer": 1000,
    "vit": 1000,
    "vit_tiny": 1000,
    "nf_resnet50": 1000,
    "nf_regnet": 1000,
    "resnet50": 1000,
    "resnet18": 512,
    "resnet18_gn": 512,
    "convnet": 768,
    "convnet_tiny": 64,
    # CI-sized NFNet (same block anatomy as nfnet_l0 at toy width)
    "nf_tiny": 128,
    # OpenAI CLIP ViT-B/32 encode_image is 512-d (networks.py:659-661,
    # 679-680; the reference's else-branch "1000" at networks.py:819 is a
    # latent bug — see models/clip_vision.py)
    "clip": 512,
    # true convnext_tiny pooled-feature dim (the reference's dim table
    # says 640, networks.py:816-817 — a latent shape bug; see convnext.py)
    "convnext": 768,
}


def _build(name: str, transfer: bool = False) -> nn.Module:
    if name == "nfnet":
        return _nfnet.nfnet_l0(num_classes=1000 if transfer else 0)
    if name in ("vit", "vit_tiny"):
        return _vit.vit_tiny_patch16_224(num_classes=1000)
    if name == "nf_tiny":
        return _nfnet.nf_tiny(num_classes=0)
    if name == "nf_resnet50":
        return _nfnet.nf_resnet50(num_classes=1000)
    if name == "nf_regnet":
        return _nfnet.nf_regnet_b1(num_classes=1000)
    if name == "resnet50":
        return _resnet.resnet50(num_classes=1000)
    if name == "resnet18":
        return _resnet.resnet18(num_classes=512, imagenet_stem=True)
    if name == "resnet18_gn":
        return _resnet.resnet18_gn(num_classes=512)
    if name == "convnet":
        # DC ConvNet used as VL encoder: GAP head to 768 features
        return _convnet.ConvNet(num_classes=768, gap=True)
    if name == "convnet_tiny":
        # CI-sized encoder: exercises every code path at toy cost
        return _convnet.ConvNet(num_classes=64, net_width=16, net_depth=2,
                                gap=True)
    if name == "clip":
        from multimodal_dataset_distillation_tpu.models import clip_vision

        return clip_vision.ClipVisionTransformer()
    if name == "convnext":
        from multimodal_dataset_distillation_tpu.models import convnext

        return convnext.convnext_tiny(num_classes=0)
    raise ValueError(f"unknown image encoder: {name}")


class ImageTower(nn.Module):
    """Uniform adapter: every encoder becomes ``__call__(x, train=False)``.

    ``x`` is NHWC float32 (CLIP-normalized).  Stateless encoders ignore
    ``train``; BN encoders read it; dropout/droppath take it as
    ``deterministic=not train``.
    """

    encoder_name: str
    transfer: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        name = self.encoder_name
        m = _build(name, self.transfer)
        if isinstance(m, (_nfnet.NormFreeNet, _vit.VisionTransformer)):
            return m(x, deterministic=not train)
        if name in ("clip", "convnext"):
            return m(x, deterministic=not train)
        return m(x, train=train)


def create_image_encoder(name: str, transfer: bool = False) -> Tuple[nn.Module, int]:
    dim_key = "nfnet_transfer" if (name == "nfnet" and transfer) else name
    return ImageTower(name, transfer), IMAGE_FEATURE_DIMS[dim_key]


def get_network(model: str, channel: int, num_classes: int,
                im_size: Tuple[int, int] = (32, 32)) -> nn.Module:
    """Legacy DC zoo surface (utils.py:148-246), returning Flax modules.

    Supports the full variant grammar: ConvNetD{1-8}, ConvNetW{32..1024},
    ConvNetA{S,R,L}, ConvNet{NN,BN,LN,IN,GN}, ConvNet{NP,MP,AP},
    MLP/LeNet/AlexNet/VGG11(BN)/ResNet18(_AP/BN_AP).
    """
    w, d, act, norm, pool = 128, 3, "relu", "instancenorm", "avgpooling"
    if model == "MLP":
        return _convnet.MLP(num_classes)
    if model == "LeNet":
        return _convnet.LeNet(num_classes)
    if model == "AlexNet":
        return _convnet.AlexNet(num_classes)
    if model.startswith("VGG"):
        base = model[:5] if model[3:5].isdigit() else model[:4]
        norm_kind = "batchnorm" if model.endswith("BN") else "instancenorm"
        return _convnet.VGG(base, num_classes, norm_kind)
    if model == "ResNet18":
        return _resnet.resnet18(num_classes)
    if model == "ResNet18_AP":
        return _resnet.resnet18_ap(num_classes)
    if model == "ResNet18BN_AP":
        return _resnet.resnet18_ap(num_classes, norm="batchnorm")
    if model.startswith("ConvNet"):
        suffix = model[len("ConvNet"):]
        if suffix.startswith("D"):
            d = int(suffix[1:])
        elif suffix.startswith("W"):
            w = int(suffix[1:])
        elif suffix == "AS":
            act = "sigmoid"
        elif suffix == "AR":
            act = "relu"
        elif suffix == "AL":
            act = "leakyrelu"
        elif suffix == "NN":
            norm = "none"
        elif suffix == "BN":
            norm = "batchnorm"
        elif suffix == "LN":
            norm = "layernorm"
        elif suffix == "IN":
            norm = "instancenorm"
        elif suffix == "GN":
            norm = "groupnorm"
        elif suffix == "NP":
            pool = "none"
        elif suffix == "MP":
            pool = "maxpooling"
        elif suffix == "AP":
            pool = "avgpooling"
        elif suffix == "KIP":
            w, norm = 1024, "none"
        elif suffix == "GAP":
            return _convnet.ConvNet(num_classes, w, d, act, norm, pool,
                                    gap=True)
        return _convnet.ConvNet(num_classes, w, d, act, norm, pool)
    raise ValueError(f"DC error: unknown model {model}")


def get_eval_pool(eval_mode: str, model: str, model_eval: str) -> list:
    """Eval-pool grammar (utils.py:336-360)."""
    if eval_mode == "M":
        return ["ConvNet", "AlexNet", "VGG11", "ResNet18_AP", "ResNet18"]
    if eval_mode == "W":
        return ["ConvNetW32", "ConvNetW64", "ConvNetW128", "ConvNetW256"]
    if eval_mode == "D":
        return ["ConvNetD1", "ConvNetD2", "ConvNetD3", "ConvNetD4"]
    if eval_mode == "A":
        return ["ConvNetAS", "ConvNetAR", "ConvNetAL"]
    if eval_mode == "P":
        return ["ConvNetNP", "ConvNetMP", "ConvNetAP"]
    if eval_mode == "N":
        return ["ConvNetNN", "ConvNetBN", "ConvNetLN", "ConvNetIN", "ConvNetGN"]
    if eval_mode == "S":
        return [model[: model.index("BN")]] if "BN" in model else [model]
    if eval_mode == "C":
        return [model, "ConvNet"]
    return [model_eval]
