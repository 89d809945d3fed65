"""Reference-checkpoint interop: torch ``module.parameters()``-order buffers.

The reference snapshots experts as ``[p.detach().cpu() for p in
net.parameters()]`` (``/root/reference/buffer.py:94-95``) — registration
order, torch layouts — and consumes them by straight concatenation
(``/root/reference/distill.py:471-476``).  These tests build faithful
torch ``nn.Module`` mirrors (timm registration order), write buffers
exactly as the reference does, and assert the codec
(``models/torch_order.py``) loads them into flats that are *bit-equal*
to the native control — plus the reverse direction: ``.pt`` files this
framework writes must concatenate correctly under the mirror's
``parameters()`` order.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402

from multimodal_dataset_distillation_tpu.config import Config  # noqa: E402
from multimodal_dataset_distillation_tpu.engine.buffer_io import (  # noqa: E402
    flatten_snapshot,
    load_buffer,
    save_expert,
)
from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder  # noqa: E402
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder  # noqa: E402
from multimodal_dataset_distillation_tpu.models.import_torch import (  # noqa: E402
    nfnet_params_to_timm,
)
from multimodal_dataset_distillation_tpu.models.torch_order import (  # noqa: E402
    codec_for_image_tower,
    codec_for_projection,
    codecs_for_student,
)


# ---------------------------------------------------------------------------
# torch mirrors with timm registration order (see torch_order.py docstring)
# ---------------------------------------------------------------------------

class _StdConv(tnn.Conv2d):
    """ScaledStdConv2d registration: Conv2d's (weight, bias) then gain."""

    def __init__(self, cin, cout, k, stride=1, groups=1):
        super().__init__(cin, cout, k, stride=stride, padding=0,
                         groups=groups, bias=True)
        self.gain = tnn.Parameter(torch.full((cout, 1, 1, 1), 1.0))


def _conv_from_shape(kshape):
    """flax (kh, kw, in/groups, out) kernel shape -> _StdConv (groups
    inferred later by the caller when it knows the true input width)."""
    kh, kw, cin_g, cout = kshape
    return kh, cin_g, cout


def _mirror_nfnet(tree):
    """torch NFNet mirror built FROM the flax param tree's shapes, with
    timm's registration order: stem -> per block [downsample?, conv1,
    conv2, conv2b?, conv3, attn_last?, skipinit_gain?] -> final_conv ->
    head.  state_dict keys match ``nfnet_params_to_timm`` exporter names
    so our weights load with strict=True."""
    root = tnn.Module()

    def std_conv(conv_tree, in_width=None):
        kh, kw, cin_g, cout = np.shape(conv_tree["kernel"])
        groups = 1 if in_width is None else in_width // cin_g
        return _StdConv(cin_g * groups, cout, kh, groups=groups)

    stem = tnn.Module()
    stem_out = None
    if "stem_conv" in tree:
        c = std_conv(tree["stem_conv"])
        stem.conv1 = c  # single-conv stems are named stem.conv1 by timm
        stem_out = c.out_channels
    else:
        i = 1
        while f"stem_conv{i}" in tree:
            c = std_conv(tree[f"stem_conv{i}"])
            setattr(stem, f"conv{i}", c)
            stem_out = c.out_channels
            i += 1
    root.stem = stem

    import re

    block_names = sorted(
        (k for k in tree if re.match(r"stage\d+_block\d+$", k)),
        key=lambda k: tuple(int(x) for x in re.findall(r"\d+", k)))
    n_stages = 1 + max(int(re.findall(r"\d+", k)[0]) for k in block_names)
    stages = tnn.ModuleList([tnn.ModuleList() for _ in range(n_stages)])
    width = stem_out
    for bn in block_names:
        blk_tree = tree[bn]
        si = int(re.findall(r"\d+", bn)[0])
        blk = tnn.Module()
        if "downsample_conv" in blk_tree:
            ds = tnn.Module()
            ds.conv = std_conv(blk_tree["downsample_conv"])
            blk.downsample = ds
        blk.conv1 = std_conv(blk_tree["conv1"])
        mid = blk.conv1.out_channels
        blk.conv2 = std_conv(blk_tree["conv2"], in_width=mid)
        if "conv2b" in blk_tree:
            blk.conv2b = std_conv(blk_tree["conv2b"], in_width=mid)
        if "se_mid" in blk_tree:
            # timm reg blocks register `attn` BETWEEN conv2(b) and conv3
            se = tnn.Module()
            c, rd = np.shape(blk_tree["se_mid"]["fc1"]["kernel"])
            se.fc1 = tnn.Conv2d(c, rd, 1, bias=True)
            se.fc2 = tnn.Conv2d(rd, c, 1, bias=True)
            blk.attn = se
        blk.conv3 = std_conv(blk_tree["conv3"])
        out_chs = blk.conv3.out_channels
        if "se" in blk_tree:
            se = tnn.Module()
            c, rd = np.shape(blk_tree["se"]["fc1"]["kernel"])
            se.fc1 = tnn.Conv2d(c, rd, 1, bias=True)
            se.fc2 = tnn.Conv2d(rd, c, 1, bias=True)
            blk.attn_last = se
        if "skipinit_gain" in blk_tree:
            blk.skipinit_gain = tnn.Parameter(torch.tensor(0.0))
        stages[si].append(blk)
        width = out_chs
    root.stages = stages
    if "final_conv" in tree:
        root.final_conv = std_conv(tree["final_conv"])
    if "head" in tree:
        head = tnn.Module()
        cin, cout = np.shape(tree["head"]["kernel"])
        head.fc = tnn.Linear(cin, cout)
        root.head = head
    return root


class _MirrorProjection(tnn.Module):
    """networks.py:625-646 registration order."""

    def __init__(self, emb, proj):
        super().__init__()
        self.projection = tnn.Linear(emb, proj)
        self.gelu = tnn.GELU()
        self.fc = tnn.Linear(proj, proj)
        self.dropout = tnn.Dropout(0.1)
        self.layer_norm = tnn.LayerNorm(proj)


def _load_projection(mirror: _MirrorProjection, tree) -> None:
    def t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))

    with torch.no_grad():
        mirror.projection.weight.copy_(t(tree["projection"]["kernel"]).T)
        mirror.projection.bias.copy_(t(tree["projection"]["bias"]))
        mirror.fc.weight.copy_(t(tree["fc"]["kernel"]).T)
        mirror.fc.bias.copy_(t(tree["fc"]["bias"]))
        mirror.layer_norm.weight.copy_(t(tree["layer_norm"]["scale"]))
        mirror.layer_norm.bias.copy_(t(tree["layer_norm"]["bias"]))


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------

def _nf_setup():
    cfg = Config(image_encoder="nf_tiny", image_size=32, seed=0)
    model = VLBiEncoder(image_encoder_name="nf_tiny",
                        text_embedding=768, image_embedding=128)
    variables = init_bi_encoder(model, cfg)
    return cfg, model, variables


def _perturbed_trajectory(params, steps=3, seed=0):
    rng = np.random.RandomState(seed)
    traj = [params]
    for _ in range(steps - 1):
        traj.append(jax.tree_util.tree_map(
            lambda x: np.asarray(
                np.asarray(x, np.float32)
                + np.asarray(0.01 * rng.randn(*np.shape(x)), np.float32)),
            traj[-1]))
    return traj


def _reference_style_save(path, mirror_factory, load_weights, traj):
    """Write a buffer EXACTLY as /root/reference/buffer.py:94-115 does:
    snapshots are ``[p.detach().cpu() for p in net.parameters()]``."""
    trajectory = []
    for snap in traj:
        mirror = mirror_factory()
        load_weights(mirror, snap)
        trajectory.append([p.detach().cpu() for p in mirror.parameters()])
    torch.save([trajectory], path)


# ---------------------------------------------------------------------------
# NFNet image tower
# ---------------------------------------------------------------------------

def test_nfnet_reference_buffer_loads_bit_exact(tmp_path):
    _, _, variables = _nf_setup()
    img_template = variables["params"]["image_encoder"]
    (inner_key,) = img_template.keys()
    traj = _perturbed_trajectory(img_template, steps=3)

    def load_weights(mirror, snap):
        sd = nfnet_params_to_timm(snap[inner_key], depths=(1, 2), stem_convs=4)
        mirror.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(
                np.asarray(v, np.float32))) for k, v in sd.items()},
            strict=True)

    path = os.path.join(tmp_path, "img_replay_buffer_0.pt")
    _reference_style_save(
        path, lambda: _mirror_nfnet(img_template[inner_key]),
        load_weights, traj)

    codec = codec_for_image_tower(img_template)
    assert codec is not None
    loaded = load_buffer(path, codec)
    assert len(loaded) == 1 and loaded[0].shape[0] == 3
    control = np.stack([flatten_snapshot(s) for s in traj])
    # bit-exact: the conversion is pure transposition/reordering
    np.testing.assert_array_equal(loaded[0], control)


def test_nfnet_codec_covers_template_and_roundtrips():
    _, _, variables = _nf_setup()
    codec = codec_for_image_tower(variables["params"]["image_encoder"])
    flat = flatten_snapshot(variables["params"]["image_encoder"])
    assert codec.total_size == flat.size
    tensors = codec.torch_from_flat(flat)
    back = codec.flat_from_torch(tensors)
    np.testing.assert_array_equal(back, flat)


def test_wrong_model_signature_raises(tmp_path):
    """A torch-order file for one tower must not silently load into a
    codec built for another (the pre-round-4 failure mode was silent)."""
    _, _, variables = _nf_setup()
    img_template = variables["params"]["image_encoder"]
    codec = codec_for_image_tower(img_template)
    # fabricate a file with a foreign signature but plausible tensors
    bogus = [[torch.randn(4, 3, 3, 3), torch.randn(4)]]
    torch.save([bogus], os.path.join(tmp_path, "img_replay_buffer_0.pt"))
    with pytest.raises(ValueError, match="shape signature"):
        load_buffer(os.path.join(tmp_path, "img_replay_buffer_0.pt"), codec)


# ---------------------------------------------------------------------------
# ProjectionHead text student
# ---------------------------------------------------------------------------

def test_projection_reference_buffer_loads_bit_exact(tmp_path):
    _, _, variables = _nf_setup()
    txt_template = variables["params"]["text_projection"]
    traj = _perturbed_trajectory(txt_template, steps=3, seed=1)

    path = os.path.join(tmp_path, "txt_replay_buffer_0.pt")
    _reference_style_save(
        path, lambda: _MirrorProjection(768, 128), _load_projection, traj)

    codec = codec_for_projection(txt_template)
    assert codec is not None
    loaded = load_buffer(path, codec)
    control = np.stack([flatten_snapshot(s) for s in traj])
    np.testing.assert_array_equal(loaded[0], control)


# ---------------------------------------------------------------------------
# reverse direction: our .pt consumed by the reference's parameters() walk
# ---------------------------------------------------------------------------

def test_saved_pt_matches_mirror_parameters_order(tmp_path):
    """save_expert's .pt must hold tensors the torch reference can
    ``torch.cat([p.reshape(-1) for p in snap])`` into the same student it
    would build from its own mirror's ``parameters()``."""
    _, _, variables = _nf_setup()
    img_template = variables["params"]["image_encoder"]
    txt_template = variables["params"]["text_projection"]
    (inner_key,) = img_template.keys()

    save_expert(str(tmp_path), [img_template], [txt_template],
                write_npz=False)

    # mirror loaded with the same weights = the reference's in-memory net
    mirror = _mirror_nfnet(img_template[inner_key])
    sd = nfnet_params_to_timm(img_template[inner_key], depths=(1, 2),
                              stem_convs=4)
    mirror.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(
            np.asarray(v, np.float32))) for k, v in sd.items()}, strict=True)
    expected = [p.detach().cpu() for p in mirror.parameters()]

    payload = torch.load(os.path.join(tmp_path, "img_replay_buffer_0.pt"),
                         weights_only=False)
    stored = payload[0][0]
    assert [tuple(t.shape) for t in stored] == \
        [tuple(t.shape) for t in expected]
    for s, e in zip(stored, expected):
        np.testing.assert_array_equal(s.numpy(), e.numpy())

    pmirror = _MirrorProjection(768, 128)
    _load_projection(pmirror, txt_template)
    expected_t = [p.detach().cpu() for p in pmirror.parameters()]
    payload_t = torch.load(os.path.join(tmp_path, "txt_replay_buffer_0.pt"),
                           weights_only=False)
    for s, e in zip(payload_t[0][0], expected_t):
        np.testing.assert_array_equal(s.numpy(), e.numpy())


# ---------------------------------------------------------------------------
# ConvNet family (used throughout CI + the DC zoo surface)
# ---------------------------------------------------------------------------

def test_convnet_reference_buffer_loads_bit_exact(tmp_path):
    cfg = Config(image_encoder="convnet_tiny", image_size=16, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    img_template = variables["params"]["image_encoder"]
    (inner_key,) = img_template.keys()
    tree = img_template[inner_key]
    traj = _perturbed_trajectory(img_template, steps=2, seed=2)

    def mirror_factory():
        mods = []
        d = 0
        while f"conv{d}" in tree:
            kh, kw, cin, cout = np.shape(tree[f"conv{d}"]["kernel"])
            mods.append(tnn.Conv2d(cin, cout, kh, padding=1, bias=True))
            if f"norm{d}" in tree:
                n = np.shape(tree[f"norm{d}"]["scale"])[0]
                mods.append(tnn.GroupNorm(n, n, affine=True))
            mods.append(tnn.ReLU())
            mods.append(tnn.AvgPool2d(2))
            d += 1
        root = tnn.Module()
        root.features = tnn.Sequential(*mods)
        cin, cout = np.shape(tree["classifier"]["kernel"])
        root.classifier = tnn.Linear(cin, cout)
        return root

    def load_weights(mirror, snap):
        t = snap[inner_key]

        def put(dst, a):
            with torch.no_grad():
                dst.copy_(torch.from_numpy(np.ascontiguousarray(
                    np.asarray(a, np.float32))))

        d = 0
        for m in mirror.features:
            if isinstance(m, tnn.Conv2d):
                put(m.weight, np.transpose(t[f"conv{d}"]["kernel"],
                                           (3, 2, 0, 1)))
                put(m.bias, t[f"conv{d}"]["bias"])
            elif isinstance(m, tnn.GroupNorm):
                put(m.weight, t[f"norm{d}"]["scale"])
                put(m.bias, t[f"norm{d}"]["bias"])
                d += 1
        put(mirror.classifier.weight,
            np.asarray(t["classifier"]["kernel"]).T)
        put(mirror.classifier.bias, t["classifier"]["bias"])

    path = os.path.join(tmp_path, "img_replay_buffer_0.pt")
    _reference_style_save(path, mirror_factory, load_weights, traj)

    codec = codec_for_image_tower(img_template)
    assert codec is not None
    loaded = load_buffer(path, codec)
    control = np.stack([flatten_snapshot(s) for s in traj])
    np.testing.assert_array_equal(loaded[0], control)


# ---------------------------------------------------------------------------
# end to end: a reference-written buffer drives the SAME distill step as
# the native-order control (f32-exact)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_distill_step_from_reference_buffer_matches_control(tmp_path):
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller

    cfg = Config(
        image_encoder="nf_tiny", image_size=32,
        num_queries=8, syn_steps=2, mini_batch_size=4,
        lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
        lr_teacher_img=0.05, lr_teacher_txt=0.05, seed=0)
    model = VLBiEncoder(image_encoder_name="nf_tiny",
                        text_embedding=768, image_embedding=128)
    variables = init_bi_encoder(model, cfg)
    img_template = variables["params"]["image_encoder"]
    txt_template = variables["params"]["text_projection"]
    (inner_key,) = img_template.keys()

    img_traj = _perturbed_trajectory(img_template, steps=3, seed=3)
    txt_traj = _perturbed_trajectory(txt_template, steps=3, seed=4)

    def load_img(mirror, snap):
        sd = nfnet_params_to_timm(snap[inner_key], depths=(1, 2),
                                  stem_convs=4)
        mirror.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(
                np.asarray(v, np.float32))) for k, v in sd.items()},
            strict=True)

    _reference_style_save(
        os.path.join(tmp_path, "img_replay_buffer_0.pt"),
        lambda: _mirror_nfnet(img_template[inner_key]), load_img, img_traj)
    _reference_style_save(
        os.path.join(tmp_path, "txt_replay_buffer_0.pt"),
        lambda: _MirrorProjection(768, 128), _load_projection, txt_traj)

    img_codec, txt_codec = codecs_for_student(variables["params"])
    img_flats = load_buffer(
        os.path.join(tmp_path, "img_replay_buffer_0.pt"), img_codec)[0]
    txt_flats = load_buffer(
        os.path.join(tmp_path, "txt_replay_buffer_0.pt"), txt_codec)[0]

    img_control = np.stack([flatten_snapshot(s) for s in img_traj])
    txt_control = np.stack([flatten_snapshot(s) for s in txt_traj])
    np.testing.assert_array_equal(img_flats, img_control)
    np.testing.assert_array_equal(txt_flats, txt_control)

    rng = np.random.RandomState(0)
    image_syn = rng.randn(8, 32, 32, 3).astype(np.float32)
    text_syn = rng.randn(8, 768).astype(np.float32)
    idx = np.stack([np.arange(4), np.arange(4)])

    d1 = Distiller(cfg, model, variables, image_syn, text_syn)
    m1 = d1.step(img_flats[0], txt_flats[0], img_flats[2], txt_flats[2], idx)
    d2 = Distiller(cfg, model, variables, image_syn, text_syn)
    m2 = d2.step(img_control[0], txt_control[0], img_control[2],
                 txt_control[2], idx)
    assert np.isfinite(float(m1["grand_loss"]))
    assert float(m1["grand_loss"]) == float(m2["grand_loss"])
    np.testing.assert_array_equal(np.asarray(d1.state.image_syn),
                                  np.asarray(d2.state.image_syn))


# ---------------------------------------------------------------------------
# legacy 0-d promotion (ADVICE r4): pre-round-4 native .pt files stored
# 0-d leaves like skipinit_gain as (1,) via ascontiguousarray — identify()
# must still match them, and fresh no-codec writes must keep true shapes
# ---------------------------------------------------------------------------

def test_legacy_0d_promoted_native_pt_loads(tmp_path):
    _, _, variables = _nf_setup()
    img_template = variables["params"]["image_encoder"]
    codec = codec_for_image_tower(img_template)
    leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(img_template)]
    assert any(x.ndim == 0 for x in leaves), "fixture must cover 0-d leaves"
    # simulate the legacy writer: ascontiguousarray promotes 0-d -> (1,)
    legacy_snap = [torch.from_numpy(np.ascontiguousarray(x)) for x in leaves]
    assert any(tuple(t.shape) == (1,) for t in legacy_snap)
    path = os.path.join(tmp_path, "img_replay_buffer_0.pt")
    torch.save([[legacy_snap]], path)
    loaded = load_buffer(path, codec)
    control = flatten_snapshot(img_template)
    np.testing.assert_array_equal(loaded[0][0], control)


def test_no_codec_write_preserves_0d_shapes(tmp_path):
    from multimodal_dataset_distillation_tpu.engine.buffer_io import (
        save_trajectories_pt,
    )

    _, _, variables = _nf_setup()
    img_template = variables["params"]["image_encoder"]
    path = os.path.join(tmp_path, "img_replay_buffer_0.pt")
    save_trajectories_pt(path, [[img_template]], codec=None)
    payload = torch.load(path, weights_only=False)
    stored_shapes = [tuple(t.shape) for t in payload[0][0]]
    leaf_shapes = [tuple(np.shape(x))
                   for x in jax.tree_util.tree_leaves(img_template)]
    assert stored_shapes == leaf_shapes  # 0-d stays 0-d
    codec = codec_for_image_tower(img_template)
    assert codec.identify(stored_shapes) == "native"


# ---------------------------------------------------------------------------
# ViT + ResNet50 families (VERDICT r4 next #2): the reference also trains
# Table-C expert buffers with `vit` (timm vit_tiny_patch16_224,
# networks.py:668) and the `resnet` timm fallback (networks.py:674) —
# mirrors below follow those libraries' registration orders exactly
# ---------------------------------------------------------------------------

def _t(a):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(a, np.float32)))


def _mirror_vit(tree):
    """timm VisionTransformer registration: patch_embed assigned first,
    but the ROOT's direct nn.Parameters (cls_token, then pos_embed) lead
    parameters() anyway — the pre-order walk yields a module's direct
    params before any submodule's."""
    root = tnn.Module()
    pe = tnn.Module()
    kh, kw, cin, cout = np.shape(tree["patch_embed"]["kernel"])
    pe.proj = tnn.Conv2d(cin, cout, kh, stride=kh)
    root.patch_embed = pe
    root.cls_token = tnn.Parameter(torch.zeros(*np.shape(tree["cls_token"])))
    root.pos_embed = tnn.Parameter(torch.zeros(*np.shape(tree["pos_embed"])))
    C = np.shape(tree["cls_token"])[-1]
    nblocks = sum(1 for k in tree if k.startswith("block"))
    blocks = []
    for i in range(nblocks):
        bt = tree[f"block{i}"]
        b = tnn.Module()
        b.norm1 = tnn.LayerNorm(C)
        attn = tnn.Module()
        attn.qkv = tnn.Linear(C, np.shape(bt["attn"]["qkv"]["kernel"])[1])
        attn.proj = tnn.Linear(C, C)
        b.attn = attn
        b.norm2 = tnn.LayerNorm(C)
        mlp = tnn.Module()
        hidden = np.shape(bt["mlp"]["fc1"]["kernel"])[1]
        mlp.fc1 = tnn.Linear(C, hidden)
        mlp.fc2 = tnn.Linear(hidden, C)
        b.mlp = mlp
        blocks.append(b)
    root.blocks = tnn.Sequential(*blocks)
    root.norm = tnn.LayerNorm(C)
    if "head" in tree:
        root.head = tnn.Linear(*np.shape(tree["head"]["kernel"]))
    return root


def _load_vit(mirror, tree):
    def lin(dst, t):
        with torch.no_grad():
            dst.weight.copy_(_t(t["kernel"]).T)
            dst.bias.copy_(_t(t["bias"]))

    with torch.no_grad():
        mirror.cls_token.copy_(_t(tree["cls_token"]))
        mirror.pos_embed.copy_(_t(tree["pos_embed"]))
        mirror.patch_embed.proj.weight.copy_(
            _t(np.transpose(tree["patch_embed"]["kernel"], (3, 2, 0, 1))))
        mirror.patch_embed.proj.bias.copy_(_t(tree["patch_embed"]["bias"]))
        for i, b in enumerate(mirror.blocks):
            bt = tree[f"block{i}"]
            for nm in ("norm1", "norm2"):
                getattr(b, nm).weight.copy_(_t(bt[nm]["scale"]))
                getattr(b, nm).bias.copy_(_t(bt[nm]["bias"]))
            lin(b.attn.qkv, bt["attn"]["qkv"])
            lin(b.attn.proj, bt["attn"]["proj"])
            lin(b.mlp.fc1, bt["mlp"]["fc1"])
            lin(b.mlp.fc2, bt["mlp"]["fc2"])
        mirror.norm.weight.copy_(_t(tree["norm"]["scale"]))
        mirror.norm.bias.copy_(_t(tree["norm"]["bias"]))
        if hasattr(mirror, "head"):
            lin(mirror.head, tree["head"])


def _mirror_resnet(tree):
    """torchvision/timm ResNet registration: conv1, bn1, layers (blocks:
    conv1,bn1,conv2,bn2[,conv3,bn3], downsample LAST), fc."""
    import re as _re

    root = tnn.Module()
    kh, kw, cin, cout = np.shape(tree["conv1"]["kernel"])
    root.conv1 = tnn.Conv2d(cin, cout, kh, stride=2, bias=False)
    root.bn1 = tnn.BatchNorm2d(cout)
    names = sorted((k for k in tree if _re.match(r"layer\d+_block\d+$", k)),
                   key=lambda k: tuple(int(x) for x in _re.findall(r"\d+", k)))
    n_layers = max(int(_re.findall(r"\d+", k)[0]) for k in names)
    layers = [tnn.Sequential() for _ in range(n_layers)]
    for bn in names:
        bt = tree[bn]
        li = int(_re.findall(r"\d+", bn)[0]) - 1
        b = tnn.Module()
        for ci in ("conv1", "conv2", "conv3"):
            if ci in bt:
                kh, kw, cin, cout = np.shape(bt[ci]["kernel"])
                setattr(b, ci, tnn.Conv2d(cin, cout, kh, bias=False))
                setattr(b, f"bn{ci[-1]}", tnn.BatchNorm2d(cout))
        if "shortcut_conv" in bt:
            kh, kw, cin, cout = np.shape(bt["shortcut_conv"]["kernel"])
            b.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, kh, bias=False), tnn.BatchNorm2d(cout))
        layers[li].append(b)
    for li, seq in enumerate(layers):
        setattr(root, f"layer{li + 1}", seq)
    if "fc" in tree:
        root.fc = tnn.Linear(*np.shape(tree["fc"]["kernel"]))
    return root


def _load_resnet(mirror, tree):
    import re as _re

    def put_conv(dst, t):
        with torch.no_grad():
            dst.weight.copy_(_t(np.transpose(t["kernel"], (3, 2, 0, 1))))

    def put_bn(dst, t):
        with torch.no_grad():
            dst.weight.copy_(_t(t["scale"]))
            dst.bias.copy_(_t(t["bias"]))

    put_conv(mirror.conv1, tree["conv1"])
    put_bn(mirror.bn1, tree["bn1"])
    for bn in (k for k in tree if _re.match(r"layer\d+_block\d+$", k)):
        li, bi = (int(x) for x in _re.findall(r"\d+", bn))
        b = getattr(mirror, f"layer{li}")[bi]
        for ci in ("conv1", "conv2", "conv3"):
            if ci in tree[bn]:
                put_conv(getattr(b, ci), tree[bn][ci])
                put_bn(getattr(b, f"bn{ci[-1]}"), tree[bn][f"bn{ci[-1]}"])
        if "shortcut_conv" in tree[bn]:
            put_conv(b.downsample[0], tree[bn]["shortcut_conv"])
            put_bn(b.downsample[1], tree[bn]["shortcut_bn"])
    if "fc" in tree:
        with torch.no_grad():
            mirror.fc.weight.copy_(_t(tree["fc"]["kernel"]).T)
            mirror.fc.bias.copy_(_t(tree["fc"]["bias"]))


def _tower_template(name, size):
    from multimodal_dataset_distillation_tpu.models.zoo import ImageTower

    t = ImageTower(name)
    v = t.init(jax.random.PRNGKey(0), __import__("jax").numpy.zeros(
        (1, size, size, 3)))
    return v["params"]


@pytest.mark.parametrize("name,size,mirror_fn,load_fn", [
    ("vit", 224, _mirror_vit, _load_vit),
    ("resnet50", 32, _mirror_resnet, _load_resnet),
    ("resnet18_gn", 32, _mirror_resnet, _load_resnet),
    ("nf_regnet", 64, _mirror_nfnet, None),  # timm-faithful mid-SE regnet
])
def test_family_reference_buffer_bit_exact(tmp_path, name, size, mirror_fn,
                                           load_fn):
    """Reference-style buffers (snapshots = mirror.parameters() in torch
    order) load bit-exactly through the codec, and our .pt round-trips
    under the mirror's parameters() walk — both directions, per family."""
    template = _tower_template(name, size)
    (inner_key,) = template.keys()
    tree = template[inner_key]
    traj = _perturbed_trajectory(template, steps=2, seed=3)

    if name == "nf_regnet":
        def load_weights(mirror, snap):
            sd = nfnet_params_to_timm(snap[inner_key], depths=(2, 4, 7, 7),
                                      stem_convs=1)
            mirror.load_state_dict(
                {k: _t(v) for k, v in sd.items()}, strict=True)

        factory = lambda: _mirror_nfnet(tree)  # noqa: E731
    else:
        def load_weights(mirror, snap):
            load_fn(mirror, snap[inner_key])

        factory = lambda: mirror_fn(tree)  # noqa: E731

    path = os.path.join(tmp_path, "img_replay_buffer_0.pt")
    _reference_style_save(path, factory, load_weights, traj)

    codec = codec_for_image_tower(template)
    assert codec is not None, f"no codec for {name}"
    loaded = load_buffer(path, codec)
    control = np.stack([flatten_snapshot(s) for s in traj])
    np.testing.assert_array_equal(loaded[0], control)

    # reverse: our codec-written .pt == the mirror's parameters() order
    save_expert(str(tmp_path / "rev"), [template], [
        {"projection": {"kernel": np.zeros((4, 4), np.float32),
                        "bias": np.zeros(4, np.float32)},
         "fc": {"kernel": np.zeros((4, 4), np.float32),
                "bias": np.zeros(4, np.float32)},
         "layer_norm": {"scale": np.ones(4, np.float32),
                        "bias": np.zeros(4, np.float32)}}],
        write_npz=False)
    mirror = factory()
    load_weights(mirror, template)
    expected = [p.detach().cpu() for p in mirror.parameters()]
    payload = torch.load(
        os.path.join(tmp_path, "rev", "img_replay_buffer_0.pt"),
        weights_only=False)
    stored = payload[0][0]
    assert [tuple(t.shape) for t in stored] == \
        [tuple(t.shape) for t in expected], name
    for s_, e_ in zip(stored, expected):
        np.testing.assert_array_equal(s_.numpy(), e_.numpy())


# ---------------------------------------------------------------------------
# codec signature disjointness (VERDICT r4 next #6): identify() can never
# mis-classify — for every supported family/config the torch and native
# shape signatures differ (0-d-normalized), and wrong-tower files refuse
# ---------------------------------------------------------------------------

def _norm_sig(sig):
    return [tuple(s) if s else (1,) for s in sig]


_DISJOINT_CASES = [
    ("nf_tiny", 32), ("convnet_tiny", 16), ("vit", 224),
    ("resnet50", 32), ("resnet18_gn", 32), ("nf_regnet", 64),
    ("nf_resnet50", 64), ("nfnet", 32),
]


@pytest.mark.parametrize("name,size", _DISJOINT_CASES)
@pytest.mark.slow
def test_codec_signature_disjoint_towers(name, size):
    template = _tower_template(name, size)
    codec = codec_for_image_tower(template)
    assert codec is not None
    assert _norm_sig(codec.torch_shapes) != _norm_sig(codec.flax_shapes), name
    # identify is exact on both
    assert codec.identify(codec.torch_shapes) == "torch"
    assert codec.identify(codec.flax_shapes) == "native"


@pytest.mark.parametrize("emb,proj", [(768, 128), (128, 128), (64, 64)])
def test_codec_signature_disjoint_projection(emb, proj):
    """Square projection dims are the adversarial case: every tensor
    SHAPE coincides between layouts, and only the sequence ordering
    (alphabetical ravel vs registration) separates the signatures."""
    tree = {"projection": {"kernel": np.zeros((emb, proj), np.float32),
                           "bias": np.zeros(proj, np.float32)},
            "fc": {"kernel": np.zeros((proj, proj), np.float32),
                   "bias": np.zeros(proj, np.float32)},
            "layer_norm": {"scale": np.ones(proj, np.float32),
                           "bias": np.zeros(proj, np.float32)}}
    codec = codec_for_projection(tree)
    assert _norm_sig(codec.torch_shapes) != _norm_sig(codec.flax_shapes)
    assert codec.identify(codec.torch_shapes) == "torch"
    assert codec.identify(codec.flax_shapes) == "native"


@pytest.mark.parametrize("wrong", ["vit", "resnet18_gn", "convnet_tiny"])
def test_wrong_tower_file_refuses_across_families(tmp_path, wrong):
    """A torch-order buffer from one family must raise (not permute) when
    loaded with another family's codec."""
    wrong_template = _tower_template(wrong, 224 if wrong == "vit" else 16)
    wrong_codec = codec_for_image_tower(wrong_template)
    tensors = wrong_codec.torch_from_flat(
        flatten_snapshot(wrong_template))
    path = os.path.join(tmp_path, "img_replay_buffer_0.pt")
    torch.save([[[torch.from_numpy(np.array(t)) for t in tensors]]], path)

    _, _, variables = _nf_setup()
    nf_codec = codec_for_image_tower(variables["params"]["image_encoder"])
    with pytest.raises(ValueError, match="shape signature"):
        load_buffer(path, nf_codec)
