"""Reference ``module.parameters()``-order codec for expert snapshots.

The reference snapshots an expert as ``[p.detach().cpu() for p in
net.parameters()]`` (``/root/reference/buffer.py:67-68,94-95``) — i.e. a
flat list of torch tensors in *module registration order* with torch
layouts (conv ``(O, I/g, kh, kw)``, Linear ``(out, in)``) — and the
distiller consumes it by straight concatenation
(``/root/reference/distill.py:471-476``).  This framework's native flat
vector is ``ravel_pytree`` order (alphabetical pytree leaves, conv HWIO,
Dense ``(in, out)``).  Loading a reference-written ``.pt`` by plain
concatenation therefore produces a silently permuted/transposed student
(same total size, wrong everything).

A :class:`TorchOrderCodec` fixes that: built from the same Flax parameter
template the student's ``ravel_pytree`` uses, it holds the ordered list
of (torch shape, layout conversion, ravel offset) entries, so snapshots
convert losslessly in both directions:

* ``flat_from_torch``: reference ``.pt`` tensor list -> our flat vector
* ``torch_from_flat``: our flat vector -> reference-order tensor list
  (what :func:`~..engine.buffer_io.save_trajectories_pt` writes so the
  actual torch reference can ``torch.load`` + concatenate our buffers)

Registration-order provenance (why the entry order below is correct):

* NF-family towers (timm ``NormFreeNet`` — the reference builds them via
  ``timm.create_model``, ``networks.py:666-672``): ``stem.conv1..4``
  then stages; ``torch.nn.Module.parameters()`` walks PRE-ORDER (a
  module's direct parameters before its submodules'), so within a block
  ``skipinit_gain`` — NormFreeBlock's only direct ``nn.Parameter`` —
  comes FIRST, then ``downsample.conv`` (registered before ``conv1``),
  ``conv1..conv3``, SE (``attn_last``) after ``conv3``; each
  ``ScaledStdConv2d`` registers ``weight``, ``bias``, then ``gain``;
  then ``final_conv`` and (when ``num_classes>0``) ``head.fc``.
  Reg-style models (timm ``nf_regnet_b1``) register SE MID-block on the
  expanded width (timm ``attn``, between ``conv2`` and ``conv3``) —
  surfaced in our tree as ``se_mid`` (``models/nfnet.py::NfBlock``), so
  the codec emits it in that position; ``se`` (timm ``attn_last``) stays
  after ``conv3``.
* timm ``vit_tiny_patch16_224`` (``networks.py:668``): the root module's
  DIRECT parameters lead the pre-order walk — ``cls_token`` then
  ``pos_embed`` (registration order) BEFORE ``patch_embed`` even though
  the attribute is assigned after it; then ``patch_embed.proj``, blocks
  (``norm1``, ``attn.qkv``, ``attn.proj``, ``norm2``, ``mlp.fc1``,
  ``mlp.fc2``), final ``norm``, ``head``.
* torchvision/timm ``resnet50`` (``networks.py:674`` fallback):
  ``conv1``, ``bn1`` (affine weight+bias; running stats are BUFFERS and
  excluded exactly as ``reparam_module.py:67-74`` excludes them), then
  layer blocks (``conv1, bn1, conv2, bn2[, conv3, bn3], downsample``
  LAST — both libraries assign ``downsample`` after the convs, unlike
  timm NormFreeBlock), then ``fc`` when the head exists.
* ``ProjectionHead`` (``networks.py:625-646``): ``projection.{weight,
  bias}``, ``fc.{weight,bias}``, ``layer_norm.{weight,bias}``.
* DC ``ConvNet`` (``networks.py:44-114``): ``features`` =
  [conv, norm, act, pool] blocks in depth order (GroupNorm affine
  ``weight`` then ``bias``), then ``classifier``.

Detection is by the full per-tensor shape signature: torch order and
ravel order give different shape *sequences* for every supported tower
(layout transposes and the alphabetical-vs-registration permutation both
shift the signature), so a file is identified before anything is
concatenated — never silently mis-ordered.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import numpy as np

_STAGE_RE = re.compile(r"stage(\d+)_block(\d+)$")


def _to_flax(kind: str, t: np.ndarray, flax_shape: Tuple[int, ...]) -> np.ndarray:
    t = np.asarray(t)
    if kind == "conv":
        return np.transpose(t, (2, 3, 1, 0))
    if kind == "linear":
        return np.ascontiguousarray(t.T)
    if kind == "se_fc":
        if t.ndim == 4:  # (rd, C, 1, 1) 1x1-conv form
            t = t[:, :, 0, 0]
        return np.ascontiguousarray(t.T)
    return t.reshape(flax_shape)


def _to_torch(kind: str, a: np.ndarray, torch_shape: Tuple[int, ...]) -> np.ndarray:
    a = np.asarray(a)
    if kind == "conv":
        return np.ascontiguousarray(np.transpose(a, (3, 2, 0, 1)))
    if kind == "linear":
        return np.ascontiguousarray(a.T)
    if kind == "se_fc":
        return np.ascontiguousarray(a.T)[:, :, None, None]
    return a.reshape(torch_shape)


def _torch_shape(kind: str, flax_shape: Tuple[int, ...]) -> Tuple[int, ...]:
    if kind == "conv":
        kh, kw, i, o = flax_shape
        return (o, i, kh, kw)
    if kind == "linear":
        i, o = flax_shape
        return (o, i)
    if kind == "se_fc":
        c, rd = flax_shape
        return (rd, c, 1, 1)
    if kind == "gain":
        return (flax_shape[0], 1, 1, 1)
    return flax_shape


@dataclasses.dataclass(frozen=True)
class _Entry:
    path: Tuple[str, ...]          # path within the student subtree
    kind: str                      # conv | linear | se_fc | gain | plain
    flax_shape: Tuple[int, ...]
    torch_shape: Tuple[int, ...]
    offset: int                    # into the ravel-order flat vector
    size: int


class TorchOrderCodec:
    """Bidirectional snapshot converter for one student subtree."""

    def __init__(self, entries: Sequence[_Entry], total_size: int,
                 flax_shapes: Sequence[Tuple[int, ...]]):
        self.entries = list(entries)
        self.total_size = int(total_size)
        #: per-tensor shape signature of a reference-order snapshot
        self.torch_shapes: List[Tuple[int, ...]] = [
            e.torch_shape for e in self.entries]
        #: shape signature of a native (ravel-order) snapshot
        self.flax_shapes: List[Tuple[int, ...]] = list(flax_shapes)
        covered = sum(e.size for e in self.entries)
        if covered != total_size:
            raise ValueError(
                f"torch-order codec covers {covered} of {total_size} "
                f"parameters — template has leaves the orderer missed")

    def flat_from_torch(self, tensors: Sequence[Any]) -> np.ndarray:
        """Reference-order tensor list -> ravel-order flat float32."""
        if len(tensors) != len(self.entries):
            raise ValueError(
                f"snapshot has {len(tensors)} tensors, codec expects "
                f"{len(self.entries)}")
        flat = np.empty(self.total_size, np.float32)
        for e, t in zip(self.entries, tensors):
            t = np.asarray(t)
            # 0-d-normalized comparison, matching identify() (legacy
            # native files promoted scalars to (1,))
            if (tuple(t.shape) or (1,)) != (e.torch_shape or (1,)):
                raise ValueError(
                    f"tensor for {'/'.join(e.path)} has shape {t.shape}, "
                    f"expected torch shape {e.torch_shape}")
            flat[e.offset:e.offset + e.size] = (
                _to_flax(e.kind, t, e.flax_shape).astype(np.float32).ravel())
        return flat

    def torch_from_flat(self, flat: np.ndarray) -> List[np.ndarray]:
        """Ravel-order flat vector -> reference-order tensor list."""
        flat = np.asarray(flat).ravel()
        if flat.size != self.total_size:
            raise ValueError(
                f"flat vector has {flat.size} params, codec expects "
                f"{self.total_size}")
        out = []
        for e in self.entries:
            a = flat[e.offset:e.offset + e.size].reshape(e.flax_shape)
            out.append(_to_torch(e.kind, a, e.torch_shape))
        return out

    def identify(self, shapes: Sequence[Tuple[int, ...]]) -> Optional[str]:
        """Which order a snapshot's shape signature matches.

        -> ``"torch"`` | ``"native"`` | ``None`` (neither).  Torch order
        wins if both signatures coincide (no supported tower does;
        tests/test_torch_order.py asserts disjointness per family).

        Shapes are compared 0-d-normalized (``() == (1,)``): pre-round-4
        native ``.pt`` files were written through ``ascontiguousarray``,
        which promotes 0-d leaves like ``skipinit_gain`` to ``(1,)`` —
        without normalization those files (which this framework itself
        wrote) would identify as neither order and refuse to load.
        Normalization cannot introduce cross-signature ambiguity: it only
        merges scalar spellings of the same one-element tensor.
        """
        def norm(sig):
            return [tuple(s) if s else (1,) for s in sig]

        shapes = norm(shapes)
        if shapes == norm(self.torch_shapes):
            return "torch"
        if shapes == norm(self.flax_shapes):
            return "native"
        return None


# ---------------------------------------------------------------------------
# ordering rules per tower family
# ---------------------------------------------------------------------------

def _conv_entries(prefix: Tuple[str, ...], d: Mapping[str, Any]) -> List[Tuple[Tuple[str, ...], str]]:
    """ScaledStdConv2d registration: weight, bias?, gain? (timm order)."""
    out = [(prefix + ("kernel",), "conv")]
    if "bias" in d:
        out.append((prefix + ("bias",), "plain"))
    if "gain" in d:
        out.append((prefix + ("gain",), "gain"))
    return out


def _nf_order(tree: Mapping[str, Any],
              prefix: Tuple[str, ...]) -> List[Tuple[Tuple[str, ...], str]]:
    order: List[Tuple[Tuple[str, ...], str]] = []
    # stem
    if "stem_conv" in tree:
        order += _conv_entries(prefix + ("stem_conv",), tree["stem_conv"])
    else:
        i = 1
        while f"stem_conv{i}" in tree:
            order += _conv_entries(prefix + (f"stem_conv{i}",),
                                   tree[f"stem_conv{i}"])
            i += 1
    # stages, numeric block order
    blocks = sorted((k for k in tree if _STAGE_RE.match(k)),
                    key=lambda k: tuple(int(x) for x in re.findall(r"\d+", k)))
    for bn in blocks:
        blk = tree[bn]
        bp = prefix + (bn,)
        # torch's parameters() walk is PRE-ORDER: a module's DIRECT
        # parameters come before any submodule's.  skipinit_gain is
        # NormFreeBlock's only direct nn.Parameter, so it precedes the
        # block's conv/attn submodule params in the reference snapshot
        # even though timm registers the attribute last.
        if "skipinit_gain" in blk:
            order.append((bp + ("skipinit_gain",), "plain"))
        if "downsample_conv" in blk:  # registered before conv1 in timm
            order += _conv_entries(bp + ("downsample_conv",),
                                   blk["downsample_conv"])
        for c in ("conv1", "conv2", "conv2b"):
            if c in blk:
                order += _conv_entries(bp + (c,), blk[c])
        if "se_mid" in blk:  # timm `attn`: mid-block SE (reg models)
            for f in ("fc1", "fc2"):
                order.append((bp + ("se_mid", f, "kernel"), "se_fc"))
                order.append((bp + ("se_mid", f, "bias"), "plain"))
        if "conv3" in blk:
            order += _conv_entries(bp + ("conv3",), blk["conv3"])
        if "se" in blk:  # timm `attn_last`: after conv3
            for f in ("fc1", "fc2"):
                order.append((bp + ("se", f, "kernel"), "se_fc"))
                order.append((bp + ("se", f, "bias"), "plain"))
    if "final_conv" in tree:
        order += _conv_entries(prefix + ("final_conv",), tree["final_conv"])
    if "head" in tree:
        order.append((prefix + ("head", "kernel"), "linear"))
        order.append((prefix + ("head", "bias"), "plain"))
    return order


def _convnet_order(tree: Mapping[str, Any],
                   prefix: Tuple[str, ...]) -> List[Tuple[Tuple[str, ...], str]]:
    order: List[Tuple[Tuple[str, ...], str]] = []
    d = 0
    while f"conv{d}" in tree:
        cp = prefix + (f"conv{d}",)
        order.append((cp + ("kernel",), "conv"))
        if "bias" in tree[f"conv{d}"]:
            order.append((cp + ("bias",), "plain"))
        if f"norm{d}" in tree:  # GroupNorm affine: weight(scale), bias
            order.append((prefix + (f"norm{d}", "scale"), "plain"))
            order.append((prefix + (f"norm{d}", "bias"), "plain"))
        d += 1
    if "classifier" in tree:
        order.append((prefix + ("classifier", "kernel"), "linear"))
        order.append((prefix + ("classifier", "bias"), "plain"))
    return order


_BLOCK_RE = re.compile(r"block(\d+)$")
_LAYER_RE = re.compile(r"layer(\d+)_block(\d+)$")


def _vit_order(tree: Mapping[str, Any],
               prefix: Tuple[str, ...]) -> List[Tuple[Tuple[str, ...], str]]:
    """timm VisionTransformer ``parameters()`` order (vit_tiny_patch16_224,
    ``networks.py:668``): the ROOT module's direct nn.Parameters lead the
    pre-order walk — cls_token then pos_embed, in registration order —
    BEFORE patch_embed's conv even though the attribute is assigned
    earlier; then per block norm1, attn.qkv, attn.proj, norm2, mlp.fc1,
    mlp.fc2 (timm Block registration), final norm, head."""
    order: List[Tuple[Tuple[str, ...], str]] = [
        (prefix + ("cls_token",), "plain"),
        (prefix + ("pos_embed",), "plain"),
        (prefix + ("patch_embed", "kernel"), "conv"),
        (prefix + ("patch_embed", "bias"), "plain"),
    ]
    blocks = sorted((k for k in tree if _BLOCK_RE.match(k)),
                    key=lambda k: int(_BLOCK_RE.match(k).group(1)))
    for bn in blocks:
        bp = prefix + (bn,)
        order += [
            (bp + ("norm1", "scale"), "plain"),
            (bp + ("norm1", "bias"), "plain"),
            (bp + ("attn", "qkv", "kernel"), "linear"),
            (bp + ("attn", "qkv", "bias"), "plain"),
            (bp + ("attn", "proj", "kernel"), "linear"),
            (bp + ("attn", "proj", "bias"), "plain"),
            (bp + ("norm2", "scale"), "plain"),
            (bp + ("norm2", "bias"), "plain"),
            (bp + ("mlp", "fc1", "kernel"), "linear"),
            (bp + ("mlp", "fc1", "bias"), "plain"),
            (bp + ("mlp", "fc2", "kernel"), "linear"),
            (bp + ("mlp", "fc2", "bias"), "plain"),
        ]
    order += [(prefix + ("norm", "scale"), "plain"),
              (prefix + ("norm", "bias"), "plain")]
    if "head" in tree:
        order += [(prefix + ("head", "kernel"), "linear"),
                  (prefix + ("head", "bias"), "plain")]
    return order


def _resnet_order(tree: Mapping[str, Any],
                  prefix: Tuple[str, ...]) -> List[Tuple[Tuple[str, ...], str]]:
    """torchvision/timm ResNet ``parameters()`` order (the reference's
    ``resnet50``/``resnet18`` fallback, ``networks.py:674``): conv1,
    bn1 affine (weight=scale then bias; running stats are buffers —
    excluded exactly as ``reparam_module.py:67-74`` excludes them), then
    per block conv1, bn1, conv2, bn2[, conv3, bn3], downsample LAST
    (both libraries register it after the convs), then fc when present."""
    order: List[Tuple[Tuple[str, ...], str]] = []

    def norm(path_):
        order.append((path_ + ("scale",), "plain"))
        order.append((path_ + ("bias",), "plain"))

    order.append((prefix + ("conv1", "kernel"), "conv"))
    if "bias" in tree.get("conv1", {}):
        order.append((prefix + ("conv1", "bias"), "plain"))
    norm(prefix + ("bn1",))
    blocks = sorted((k for k in tree if _LAYER_RE.match(k)),
                    key=lambda k: tuple(int(x)
                                        for x in _LAYER_RE.match(k).groups()))
    for bn in blocks:
        blk = tree[bn]
        bp = prefix + (bn,)
        for ci in ("conv1", "conv2", "conv3"):
            if ci in blk:
                order.append((bp + (ci, "kernel"), "conv"))
                if "bias" in blk[ci]:
                    order.append((bp + (ci, "bias"), "plain"))
                norm(bp + (f"bn{ci[-1]}",))
        if "shortcut_conv" in blk:  # torch `downsample.{0,1}`, registered last
            order.append((bp + ("shortcut_conv", "kernel"), "conv"))
            if "bias" in blk["shortcut_conv"]:
                order.append((bp + ("shortcut_conv", "bias"), "plain"))
            norm(bp + ("shortcut_bn",))
    if "fc" in tree:
        order.append((prefix + ("fc", "kernel"), "linear"))
        order.append((prefix + ("fc", "bias"), "plain"))
    return order


def _projection_order(tree: Mapping[str, Any],
                      prefix: Tuple[str, ...]) -> List[Tuple[Tuple[str, ...], str]]:
    return [
        (prefix + ("projection", "kernel"), "linear"),
        (prefix + ("projection", "bias"), "plain"),
        (prefix + ("fc", "kernel"), "linear"),
        (prefix + ("fc", "bias"), "plain"),
        # torch LayerNorm registers weight (our `scale`) then bias
        (prefix + ("layer_norm", "scale"), "plain"),
        (prefix + ("layer_norm", "bias"), "plain"),
    ]


# ---------------------------------------------------------------------------
# codec construction from a student template
# ---------------------------------------------------------------------------

def _path_key(path) -> Tuple[str, ...]:
    out = []
    for p in path:
        out.append(p.key if hasattr(p, "key") else str(p))
    return tuple(out)


def _ravel_index(template: Any) -> Tuple[Dict[Tuple[str, ...], Tuple[int, int, Tuple[int, ...]]], int, List[Tuple[int, ...]]]:
    """path -> (offset, size, shape) in ``ravel_pytree`` leaf order."""
    leaves, _ = jax.tree_util.tree_flatten_with_path(template)
    index: Dict[Tuple[str, ...], Tuple[int, int, Tuple[int, ...]]] = {}
    shapes: List[Tuple[int, ...]] = []
    off = 0
    for path, leaf in leaves:
        shape = tuple(np.shape(leaf))
        size = int(np.prod(shape)) if shape else 1
        index[_path_key(path)] = (off, size, shape)
        shapes.append(shape)
        off += size
    return index, off, shapes


def _build(template: Any,
           order: List[Tuple[Tuple[str, ...], str]]) -> TorchOrderCodec:
    index, total, flax_shapes = _ravel_index(template)
    entries = []
    for path, kind in order:
        if path not in index:
            raise KeyError(f"orderer emitted {'/'.join(path)} not in template")
        off, size, shape = index[path]
        entries.append(_Entry(path, kind, shape, _torch_shape(kind, shape),
                              off, size))
    return TorchOrderCodec(entries, total, flax_shapes)


def codec_for_image_tower(template: Mapping[str, Any]) -> Optional[TorchOrderCodec]:
    """Codec for ``params["image_encoder"]`` (the ImageTower subtree).

    Covers the NF family (nfnet_l0/nf_resnet50/nf_regnet_b1), the DC
    ConvNet, timm ViT (vit_tiny_patch16_224) and torchvision/timm
    ResNet (resnet50/resnet18 fallback) — every tower family Table C
    trains expert buffers with (``networks.py:666-674``).  Returns
    ``None`` for families without an orderer (CLIP, convnext) — callers
    then refuse torch-order files loudly instead of guessing.
    """
    if not isinstance(template, Mapping) or len(template) != 1:
        return None
    (inner_key, tree), = template.items()
    if not isinstance(tree, Mapping):
        return None
    prefix = (inner_key,)
    if "stem_conv" in tree or "stem_conv1" in tree:
        return _build(template, _nf_order(tree, prefix))
    if "conv0" in tree and "classifier" in tree:
        return _build(template, _convnet_order(tree, prefix))
    if "cls_token" in tree and "patch_embed" in tree:
        return _build(template, _vit_order(tree, prefix))
    if "conv1" in tree and any(_LAYER_RE.match(k) for k in tree):
        return _build(template, _resnet_order(tree, prefix))
    return None


def codec_for_projection(template: Mapping[str, Any]) -> Optional[TorchOrderCodec]:
    """Codec for ``params["text_projection"]`` (ProjectionHead)."""
    if not isinstance(template, Mapping) or "projection" not in template:
        return None
    return _build(template, _projection_order(template, ()))


def codecs_for_student(params: Mapping[str, Any]) -> Tuple[Optional[TorchOrderCodec], Optional[TorchOrderCodec]]:
    """(img_codec, txt_codec) from a bi-encoder ``params`` tree; either
    may be None when the tower family has no orderer."""
    img = codec_for_image_tower(params.get("image_encoder", {}))
    txt = codec_for_projection(params.get("text_projection", {}))
    return img, txt
