"""Real-data parity on the annotation layer: the PUBLISHED Flickr30K
retrieval-eval JSONs (shipped with the reference checkout at
``/root/reference/Flickr30k/ann_file/``) parsed by our ``JsonVLEval``
must produce byte-identical structures to the reference's own
``flickr30k_retrieval_eval`` logic (``data/flickr30k_dataset.py:87-118``):
the pre_caption-cleaned text list, the image filename list, and the
``img2txt``/``txt2img`` ground-truth maps that ``itm_eval`` ranks
against.

Images and pretrained weights are not available in this environment
(the remaining real-data gap is quality tuning, VERDICT r2 missing #2),
but the annotation/caption layer — where a silent off-by-one or caption
mismatch would corrupt every published R@k — CAN be validated against
the real data, with the reference's own ``pre_caption`` imported
read-only as the oracle.
"""

import json
import os
import sys

import pytest

REFERENCE_ANN = "/root/reference/Flickr30k/ann_file"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ANN),
    reason="reference Flickr30k ann_file checkout not available")


def _reference_pre_caption():
    """The reference's own caption cleaner, imported as a parity oracle
    (flickr30k_dataset.py:16-35) — read-only, never vendored.  The
    module file is loaded directly (not through the reference's
    ``data/__init__.py``, which needs torchvision) with a stub for its
    ``download_url`` import; torchvision is not in this image."""
    import importlib.util
    import types

    if "torchvision" not in sys.modules:
        from importlib.machinery import ModuleSpec

        def _stub(name):
            m = types.ModuleType(name)
            m.__spec__ = ModuleSpec(name, loader=None)
            sys.modules[name] = m
            return m

        tv = _stub("torchvision")
        ds = _stub("torchvision.datasets")
        utils = _stub("torchvision.datasets.utils")
        utils.download_url = lambda *a, **k: None
        tv.datasets = ds
        ds.utils = utils
        tr = _stub("torchvision.transforms")
        trf = _stub("torchvision.transforms.functional")

        class _Interp:  # enum stand-in; never exercised
            BICUBIC = "bicubic"

        trf.InterpolationMode = _Interp
        tr.functional = trf
        tv.transforms = tr
    spec = importlib.util.spec_from_file_location(
        "_ref_flickr30k_dataset",
        "/root/reference/data/flickr30k_dataset.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.pre_caption


@pytest.mark.parametrize("split,n_images", [("test", 1000), ("val", 1014)])
def test_flickr_eval_structures_match_reference(split, n_images):
    from multimodal_dataset_distillation_tpu.data.datasets import JsonVLEval

    ann_file = os.path.join(REFERENCE_ANN, f"flickr30k_{split}.json")
    ours = JsonVLEval(ann_file, image_root="/nonexistent",
                      transform=lambda x: x)

    # reproduce the reference's index construction with ITS pre_caption
    ref_pre = _reference_pre_caption()
    with open(ann_file) as f:
        annotation = json.load(f)
    text, image, img2txt, txt2img = [], [], {}, {}
    txt_id = 0
    for img_id, ann in enumerate(annotation):
        image.append(ann["image"])
        img2txt[img_id] = []
        for caption in ann["caption"]:
            text.append(ref_pre(caption, 30))
            img2txt[img_id].append(txt_id)
            txt2img[txt_id] = img_id
            txt_id += 1

    assert len(ours) == n_images  # SURVEY §3.4's verified counts
    assert ours.image == image
    assert ours.text == text  # byte-identical cleaned captions
    assert ours.img2txt == img2txt
    assert ours.txt2img == txt2img
    # the 5-captions-per-image structure itm_eval's ranks key off
    assert len(ours.text) == 5 * n_images
    assert all(len(v) == 5 for v in ours.img2txt.values())


def test_real_captions_hit_cleaning_edge_cases():
    """The real corpus must actually exercise pre_caption's rules
    (otherwise the parity above is vacuous): punctuation stripping,
    whitespace collapse, and the 30-word truncation all occur."""
    from multimodal_dataset_distillation_tpu.data.caption import pre_caption
    from multimodal_dataset_distillation_tpu.data.datasets import JsonVLEval

    ann_file = os.path.join(REFERENCE_ANN, "flickr30k_test.json")
    with open(ann_file) as f:
        raw = [c for ann in json.load(f) for c in ann["caption"]]
    cleaned = JsonVLEval(ann_file, image_root="/nonexistent",
                         transform=lambda x: x).text
    assert any(any(ch in c for ch in '.!"()*#:;~') for c in raw)
    assert any(len(c.split()) > 30 for c in raw)
    assert all(len(c.split()) <= 30 for c in cleaned)
    assert all(not any(ch in c for ch in '.!"()*#:;~') for c in cleaned)
    # spot: cleaning is not a no-op on this corpus
    assert sum(ref != got for ref, got in
               zip((c.lower() for c in raw), cleaned)) > 100
    assert pre_caption(raw[0], 30) == cleaned[0]
