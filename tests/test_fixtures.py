"""Offline fixture generators produce the EXACT reference containers.

tools/make_fixtures.py fabricates COCO-Karpathy JSONs and ROCOv2 CSVs
(the BASELINE #3/#4 rehearsal inputs, tools/quality_{coco,roco}.sh);
these tests pin that our loaders consume them with reference semantics:
repeated-image_id contrastive ids (coco_dataset.py:46-52), pre_caption
cleaning, the 5-caption eval maps (coco_dataset.py:128-140), and the
ROCO black-image fallback for corrupt AND missing files
(rocov2Radiology_dataset.py:60-68)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixtures(tmp_path_factory):
    root = tmp_path_factory.mktemp("fixtures")
    for args in (["coco", str(root / "coco"), "12", "6"],
                 ["roco", str(root / "roco"), "16"]):
        subprocess.run([sys.executable,
                        os.path.join(REPO, "tools", "make_fixtures.py"),
                        *args], check=True)
    return root


def _ident(img):
    return np.asarray(img, np.float32)


def test_coco_fixture_reference_semantics(fixtures):
    from multimodal_dataset_distillation_tpu.data.datasets import (
        JsonVLEval,
        JsonVLTrain,
    )

    root = str(fixtures / "coco" / "images")
    ann = str(fixtures / "coco" / "ann")
    tr = JsonVLTrain(os.path.join(ann, "coco_karpathy_train.json"), root,
                     _ident)
    # 2 caption rows per image -> repeated image_id maps to ONE
    # contrastive id (reference img_ids dedup, coco_dataset.py:46-52)
    assert len(tr) == 24
    img0, cap0, cid0 = tr[0]
    img1, cap1, cid1 = tr[1]
    assert cid0 == cid1 == 0  # same image, two captions
    assert cap0 != cap1
    np.testing.assert_array_equal(img0, img1)
    _, _, cid2 = tr[2]
    assert cid2 == 1
    assert all(c == c.lower() for c in tr.get_all_captions())

    ev = JsonVLEval(os.path.join(ann, "coco_karpathy_test.json"), root,
                    _ident)
    assert len(ev.image) == 6 and len(ev.text) == 30
    assert ev.img2txt[0] == [0, 1, 2, 3, 4]
    assert ev.txt2img[7] == 1
    img, idx = ev[3]
    assert idx == 3 and img.shape == (64, 64, 3)


def test_roco_fixture_black_fallback(fixtures):
    from multimodal_dataset_distillation_tpu.data.datasets import (
        RocoEval,
        RocoTrain,
    )

    csv = str(fixtures / "roco" / "radiologytraindata.csv")
    root = str(fixtures / "roco" / "images")
    tr = RocoTrain(csv, root, _ident, image_size=64)
    assert len(tr) == 16
    # row 1 = corrupt jpeg, row 2 = missing file -> both black
    for bad in (1, 2):
        img, cap, idx = tr[bad]
        assert idx == bad and cap
        np.testing.assert_array_equal(img, 0.0)
    img, _, _ = tr[0]
    assert float(np.abs(img).sum()) > 0  # healthy row decodes

    ev = RocoEval(csv, root, _ident, image_size=64)
    assert len(ev.image) == 16 and ev.img2txt[3] == [3]
    img, idx = ev[1]
    np.testing.assert_array_equal(img, 0.0)


def test_roco_train_caps_rows(fixtures, tmp_path):
    """max_images head() cap (reference roco_train max_images=1000)."""
    from multimodal_dataset_distillation_tpu.data.datasets import RocoTrain

    csv = str(fixtures / "roco" / "radiologytraindata.csv")
    tr = RocoTrain(csv, str(fixtures / "roco" / "images"), _ident,
                   max_images=5, image_size=64)
    assert len(tr) == 5
