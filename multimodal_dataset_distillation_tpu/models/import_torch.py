"""torch/timm -> Flax weight import for the NFNet family.

The reference builds its image towers pretrained via timm
(``networks.py:666-672``: ``timm.create_model('nfnet_l0', pretrained=True,
num_classes=0, global_pool='avg')``).  On TPU hosts timm/torch weights
arrive as a state-dict file; this module maps timm's NormFreeNet parameter
naming onto :mod:`~.nfnet`'s Flax tree.

Conventions handled:
* conv weights: torch ``(out, in/groups, kh, kw)`` -> flax HWIO
  ``(kh, kw, in/groups, out)``
* ScaledStdConv ``gain``: torch ``(out, 1, 1, 1)`` -> flax ``(out,)``
* SE ``fc1``/``fc2``: timm uses 1x1 Conv2d ``(rd, C, 1, 1)``; ours are
  Dense ``(C, rd)`` — squeezed + transposed
* ``skipinit_gain``: scalar
* linear head: torch ``(out, in)`` -> flax ``(in, out)``

Weight standardization itself is applied at *runtime* in both frameworks
(weights are stored raw), so import is pure renaming + transposition.
Gamma placement note: timm folds the variance-preserving ``gamma`` into
each conv while this implementation applies it at the activation site;
the two are mathematically identical because every conv input here passes
through exactly one ``gamma_act`` (and the stem's first conv sees raw
pixels in both, with no gamma anywhere).

Usage::

    sd = torch.load("nfnet_l0.pth", map_location="cpu")  # or np dict
    params = nfnet_l0_params_from_timm(sd, depths=(1, 2, 6, 3))
    variables = {"params": {"image_encoder": {"ImageTower_0": params}}}
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _conv(sd: Mapping[str, Any], prefix: str, gain: bool = True) -> Dict[str, np.ndarray]:
    out = {"kernel": np.transpose(_np(sd[prefix + ".weight"]), (2, 3, 1, 0))}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"]).reshape(-1)
    if gain and prefix + ".gain" in sd:
        out["gain"] = _np(sd[prefix + ".gain"]).reshape(-1)
    return out


def _se(sd: Mapping[str, Any], prefix: str) -> Dict[str, Dict[str, np.ndarray]]:
    """timm SqueezeExcite: 1x1 convs fc1/fc2 -> our Dense fc1/fc2."""
    def dense(name):
        w = _np(sd[f"{prefix}.{name}.weight"])
        if w.ndim == 4:  # (out, in, 1, 1)
            w = w[:, :, 0, 0]
        return {"kernel": np.ascontiguousarray(w.T),
                "bias": _np(sd[f"{prefix}.{name}.bias"]).reshape(-1)}

    return {"fc1": dense("fc1"), "fc2": dense("fc2")}


def nfnet_params_from_timm(sd: Mapping[str, Any],
                           depths: Sequence[int] = (1, 2, 6, 3),
                           stem_convs: int = 4,
                           extra_conv: bool = True,
                           has_se: bool = True,
                           has_skipinit: bool = True,
                           has_final_conv: bool = True,
                           num_classes: int = 0) -> Dict[str, Any]:
    """Map a timm NormFreeNet state dict onto our Flax param tree.

    Works for ``nfnet_l0`` (defaults), ``nf_resnet50``
    (``stem_convs=1, extra_conv=False, has_se=False, has_skipinit=False,
    has_final_conv=False, num_classes=1000``) and ``nf_regnet_b1``
    analogously.
    """
    params: Dict[str, Any] = {}

    # ---- stem ----
    if stem_convs == 1:
        params["stem_conv"] = _conv(sd, "stem.conv1" if "stem.conv1.weight"
                                    in sd else "stem.conv")
    else:
        for i in range(1, stem_convs + 1):
            params[f"stem_conv{i}"] = _conv(sd, f"stem.conv{i}")

    # ---- stages ----
    for si, depth in enumerate(depths):
        for bi in range(depth):
            p = f"stages.{si}.{bi}"
            blk: Dict[str, Any] = {
                "conv1": _conv(sd, p + ".conv1"),
                "conv2": _conv(sd, p + ".conv2"),
                "conv3": _conv(sd, p + ".conv3"),
            }
            if extra_conv and p + ".conv2b.weight" in sd:
                blk["conv2b"] = _conv(sd, p + ".conv2b")
            if p + ".downsample.conv.weight" in sd:
                blk["downsample_conv"] = _conv(sd, p + ".downsample.conv")
            if has_se:
                # timm `attn_last` (after conv3, NFNet blocks) -> se;
                # timm `attn` (mid-block on the expanded width, reg
                # models like nf_regnet_b1) -> se_mid
                if f"{p}.attn_last.fc1.weight" in sd:
                    blk["se"] = _se(sd, f"{p}.attn_last")
                if f"{p}.attn.fc1.weight" in sd:
                    blk["se_mid"] = _se(sd, f"{p}.attn")
            if has_skipinit and p + ".skipinit_gain" in sd:
                blk["skipinit_gain"] = _np(sd[p + ".skipinit_gain"]).reshape(())
            params[f"stage{si}_block{bi}"] = blk

    # ---- head ----
    if has_final_conv and "final_conv.weight" in sd:
        params["final_conv"] = _conv(sd, "final_conv")
    if num_classes and "head.fc.weight" in sd:
        params["head"] = {
            "kernel": np.ascontiguousarray(_np(sd["head.fc.weight"]).T),
            "bias": _np(sd["head.fc.bias"]).reshape(-1)}
    return params


def nfnet_params_to_timm(params: Mapping[str, Any],
                         depths: Sequence[int] = (1, 2, 6, 3),
                         stem_convs: int = 4) -> Dict[str, np.ndarray]:
    """Inverse mapping (export our params in timm naming) — used to write
    reference-consumable checkpoints and for import round-trip tests."""
    sd: Dict[str, np.ndarray] = {}

    def put_conv(tprefix, tree):
        sd[tprefix + ".weight"] = np.transpose(np.asarray(tree["kernel"]),
                                               (3, 2, 0, 1))
        if "bias" in tree:
            sd[tprefix + ".bias"] = np.asarray(tree["bias"])
        if "gain" in tree:
            sd[tprefix + ".gain"] = np.asarray(tree["gain"]).reshape(-1, 1, 1, 1)

    if stem_convs == 1:
        put_conv("stem.conv1", params["stem_conv"])
    else:
        for i in range(1, stem_convs + 1):
            put_conv(f"stem.conv{i}", params[f"stem_conv{i}"])

    for si, depth in enumerate(depths):
        for bi in range(depth):
            blk = params.get(f"stage{si}_block{bi}")
            if blk is None:
                continue
            p = f"stages.{si}.{bi}"
            for cname in ("conv1", "conv2", "conv2b", "conv3"):
                if cname in blk:
                    put_conv(f"{p}.{cname}", blk[cname])
            if "downsample_conv" in blk:
                put_conv(f"{p}.downsample.conv", blk["downsample_conv"])
            for our_name, timm_name in (("se", "attn_last"),
                                        ("se_mid", "attn")):
                if our_name in blk:
                    for f in ("fc1", "fc2"):
                        w = np.asarray(blk[our_name][f]["kernel"]).T
                        sd[f"{p}.{timm_name}.{f}.weight"] = w[:, :, None, None]
                        sd[f"{p}.{timm_name}.{f}.bias"] = np.asarray(
                            blk[our_name][f]["bias"])
            if "skipinit_gain" in blk:
                sd[f"{p}.skipinit_gain"] = np.asarray(
                    blk["skipinit_gain"]).reshape(())
    if "final_conv" in params:
        put_conv("final_conv", params["final_conv"])
    if "head" in params:
        sd["head.fc.weight"] = np.ascontiguousarray(
            np.asarray(params["head"]["kernel"]).T)
        sd["head.fc.bias"] = np.asarray(params["head"]["bias"])
    return sd


def vit_params_from_timm(sd: Mapping[str, Any],
                         depth: int = 12) -> Dict[str, Any]:
    """Map a timm VisionTransformer state dict (``vit_tiny_patch16_224``,
    ``networks.py:668``) onto our Flax tree (:mod:`~.vit`).

    timm naming: ``cls_token``/``pos_embed``, ``patch_embed.proj.*``,
    ``blocks.{i}.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}``,
    ``norm``, ``head``.  The qkv output dim splits (3, heads, head_dim)
    in both frameworks, so a plain Linear transpose is layout-exact.
    Real-format parity test: tests/test_real_format_import.py (torch
    mirror forward vs imported Flax forward).
    """
    def lin(prefix):
        return {"kernel": np.ascontiguousarray(_np(sd[prefix + ".weight"]).T),
                "bias": _np(sd[prefix + ".bias"]).reshape(-1)}

    params: Dict[str, Any] = {
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "patch_embed": {
            "kernel": np.transpose(_np(sd["patch_embed.proj.weight"]),
                                   (2, 3, 1, 0)),
            "bias": _np(sd["patch_embed.proj.bias"]).reshape(-1)},
        "norm": {"scale": _np(sd["norm.weight"]).reshape(-1),
                 "bias": _np(sd["norm.bias"]).reshape(-1)},
    }
    for i in range(depth):
        p = f"blocks.{i}."
        params[f"block{i}"] = {
            "norm1": {"scale": _np(sd[p + "norm1.weight"]).reshape(-1),
                      "bias": _np(sd[p + "norm1.bias"]).reshape(-1)},
            "norm2": {"scale": _np(sd[p + "norm2.weight"]).reshape(-1),
                      "bias": _np(sd[p + "norm2.bias"]).reshape(-1)},
            "attn": {"qkv": lin(p + "attn.qkv"),
                     "proj": lin(p + "attn.proj")},
            "mlp": {"fc1": lin(p + "mlp.fc1"), "fc2": lin(p + "mlp.fc2")},
        }
    if "head.weight" in sd:
        params["head"] = lin("head")
    return params


def resnet_params_from_torch(sd: Mapping[str, Any]) -> "Tuple[Dict[str, Any], Dict[str, Any]]":
    """Map a torchvision/timm ResNet state dict (``resnet50``/``resnet18``
    — the reference ImageEncoder fallback, ``networks.py:674``) onto
    :mod:`~.resnet`'s Flax tree.

    Returns ``(params, batch_stats)``: BN affine (weight/bias ->
    scale/bias) lands in params; the running statistics — which torch
    treats as buffers and the reference EXCLUDES from trajectories
    (``reparam_module.py:67-74``) — land in the ``batch_stats``
    collection so a pretrained tower evaluates identically under
    ``train=False``.  Naming: ``layer{L}.{i}.*`` -> ``layer{L}_block{i}``,
    ``downsample.{0,1}`` -> ``shortcut_conv``/``shortcut_bn``.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(prefix):
        return {"kernel": np.transpose(_np(sd[prefix + ".weight"]),
                                       (2, 3, 1, 0))}

    def bn(prefix, pdst, sdst, name):
        pdst[name] = {"scale": _np(sd[prefix + ".weight"]).reshape(-1),
                      "bias": _np(sd[prefix + ".bias"]).reshape(-1)}
        if prefix + ".running_mean" in sd:
            sdst[name] = {
                "mean": _np(sd[prefix + ".running_mean"]).reshape(-1),
                "var": _np(sd[prefix + ".running_var"]).reshape(-1)}

    params["conv1"] = conv("conv1")
    bn("bn1", params, stats, "bn1")
    li = 1
    while f"layer{li}.0.conv1.weight" in sd:
        bi = 0
        while f"layer{li}.{bi}.conv1.weight" in sd:
            p = f"layer{li}.{bi}"
            name = f"layer{li}_block{bi}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for ci in ("conv1", "conv2", "conv3"):
                if f"{p}.{ci}.weight" in sd:
                    blk_p[ci] = conv(f"{p}.{ci}")
                    bn(f"{p}.bn{ci[-1]}", blk_p, blk_s, f"bn{ci[-1]}")
            if f"{p}.downsample.0.weight" in sd:
                blk_p["shortcut_conv"] = conv(f"{p}.downsample.0")
                bn(f"{p}.downsample.1", blk_p, blk_s, "shortcut_bn")
            params[name] = blk_p
            if blk_s:
                stats[name] = blk_s
            bi += 1
        li += 1
    if "fc.weight" in sd:
        params["fc"] = {
            "kernel": np.ascontiguousarray(_np(sd["fc.weight"]).T),
            "bias": _np(sd["fc.bias"]).reshape(-1)}
    return params, stats


def load_image_tower_weights(variables: Dict[str, Any], sd: Mapping[str, Any],
                             arch: str = "nfnet") -> Dict[str, Any]:
    """Return a copy of bi-encoder ``variables`` with the image tower
    replaced by timm weights from state dict ``sd``."""
    import copy

    arch_kw = {
        "nfnet": dict(depths=(1, 2, 6, 3), stem_convs=4, extra_conv=True,
                      has_se=True, has_skipinit=True, has_final_conv=True),
        "nf_resnet50": dict(depths=(3, 4, 6, 3), stem_convs=1,
                            extra_conv=False, has_se=False,
                            has_skipinit=False, has_final_conv=False,
                            num_classes=1000),
        "nf_regnet": dict(depths=(2, 4, 7, 7), stem_convs=1,
                          extra_conv=False, has_se=True, has_skipinit=False,
                          has_final_conv=True, num_classes=1000),
    }
    mapped_stats = None
    if arch in ("vit", "vit_tiny"):
        depth = 1 + max((int(k.split(".")[1]) for k in sd
                         if k.startswith("blocks.")), default=-1)
        mapped = vit_params_from_timm(sd, depth=depth)
    elif arch in ("resnet50", "resnet18"):
        mapped, mapped_stats = resnet_params_from_torch(sd)
    else:
        mapped = nfnet_params_from_timm(sd, **arch_kw[arch])

    new_vars = copy.deepcopy(
        {k: v for k, v in variables.items()})
    tower = new_vars["params"]["image_encoder"]
    # the ImageTower wrapper nests the backbone one level down
    inner_key = next(iter(tower))
    template = tower[inner_key]

    def merge(dst, src, path=""):
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"imported param {path + k} not in model")
            if isinstance(v, dict):
                merge(dst[k], v, path + k + "/")
            else:
                have = np.asarray(dst[k])
                if have.shape != np.asarray(v).shape:
                    raise ValueError(
                        f"shape mismatch at {path + k}: model {have.shape} "
                        f"vs import {np.asarray(v).shape}")
                dst[k] = np.asarray(v, have.dtype)

    merge(template, mapped)
    if mapped_stats and "batch_stats" in new_vars:
        # BN running statistics: buffers on the torch side (excluded
        # from trajectories, reparam_module.py:67-74) -> flax
        # batch_stats collection, so eval under train=False matches
        merge(new_vars["batch_stats"]["image_encoder"][inner_key],
              mapped_stats)
    return new_vars


# timm checkpoint filenames as they land in the torch-hub cache when the
# reference runs `timm.create_model(..., pretrained=True)`
# (networks.py:666-672)
_TIMM_CKPT_NAMES = {
    "nfnet": ("nfnet_l0_ra2-45c6688d.pth",),
    "nf_resnet50": ("nf_resnet50_ra2-9f236009.pth",),
    "nf_regnet": ("nf_regnet_b1_256_ra2-ad85cfef.pth",),
    # reference fallback towers (networks.py:674) — timm 0.6.x hub names
    "resnet50": ("resnet50_a1_0-14fe96d1.pth", "resnet50_ram-a26f946b.pth"),
    "resnet18": ("resnet18-5c106cde.pth",),
    # vit_tiny ships via augreg npz/HF in recent timm; no stable hub
    # filename to scan for — point $MDD_TIMM_CKPT_VIT at a torch-format
    # state dict instead (vit_params_from_timm consumes timm naming)
    "vit": (),
}


def find_local_timm_checkpoint(arch: str) -> "str | None":
    """Path of a locally available timm checkpoint for ``arch``, or None.

    Search order: ``$MDD_TIMM_CKPT_<ARCH>``, ``$MDD_TIMM_CKPT``, then the
    torch-hub cache (``~/.cache/torch/hub/checkpoints``) under the known
    timm filenames.  Zero-egress friendly: nothing is ever downloaded.
    """
    import os

    for env in (f"MDD_TIMM_CKPT_{arch.upper()}", "MDD_TIMM_CKPT"):
        p = os.environ.get(env)
        if p and os.path.exists(p):
            return p
    hub = os.path.join(os.path.expanduser("~"), ".cache", "torch", "hub",
                       "checkpoints")
    for name in _TIMM_CKPT_NAMES.get(arch, ()):
        p = os.path.join(hub, name)
        if os.path.exists(p):
            return p
    return None


def load_timm_state_dict(arch: str) -> "tuple[Dict[str, Any] | None, str | None]":
    """(state_dict, path) of the local timm checkpoint for ``arch``, or
    (None, None).  The single place that knows how to locate/load/unwrap
    a timm file — teachers (maybe_load_pretrained_image_tower) and eval
    students (cli/distill.make_eval_initializer) must start from the
    SAME weights for the same --image_pretrained run, so both go through
    here (same arch gate, same 'state_dict' unwrap)."""
    if arch not in _TIMM_CKPT_NAMES:
        return None, None
    path = find_local_timm_checkpoint(arch)
    if path is None:
        return None, None
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd, path


def maybe_load_pretrained_image_tower(variables: Dict[str, Any],
                                      arch: str) -> "tuple[Dict[str, Any], str | None]":
    """Replace the image tower with local timm weights when available.

    The reference builds its towers with ``pretrained=args.image_pretrained``
    (networks.py:666); offline TPU hosts have no network, so this loads
    from a local file only (:func:`find_local_timm_checkpoint`) and falls
    back to the existing (random) init when none exists.  Returns
    ``(variables, checkpoint_path_or_None)``.
    """
    sd, path = load_timm_state_dict(arch)
    if sd is None:
        return variables, None
    return load_image_tower_weights(variables, sd, arch=arch), path
