"""utils/visualize.py: grids, sentence decode, distilled-tensor saves.

Reference behaviors covered: nearest-neighbor synthetic-text decoding
(distill.py:89-95), the per-eval artifact suite (distill.py:358-426),
and the ``ipc < 50 or --force_save`` grid gate (distill.py:368).
"""

import numpy as np

from multimodal_dataset_distillation_tpu.utils.visualize import (
    nearest_neighbor,
    save_visualizations,
)


def test_nearest_neighbor_decodes_to_closest_caption():
    # three orthogonal caption embeddings; synthetic texts sit near them
    embed = np.eye(3, dtype=np.float32)
    sentences = ["cap a", "cap b", "cap c"]
    syn = np.array([[0.1, 0.9, 0.0],   # -> cap b
                    [5.0, 0.1, 0.1],   # -> cap a (cosine, not L2)
                    [0.0, 0.0, -1.0]], np.float32)  # farthest from c... but
    out = nearest_neighbor(sentences, syn, embed)
    assert out[0] == "cap b" and out[1] == "cap a"
    assert len(out) == 3


def _syn(n=4, hw=8):
    rng = np.random.RandomState(0)
    return (rng.randn(n, hw, hw, 3).astype(np.float32),
            rng.randn(n, 16).astype(np.float32))


def test_save_visualizations_artifacts(tmp_path):
    img, txt = _syn()
    embed = np.random.RandomState(1).randn(5, 16).astype(np.float32)
    sents = [f"s{i}" for i in range(5)]
    arts = save_visualizations(str(tmp_path), 7, img, txt, sents, embed)
    for key in ("grid", "sentences", "clipped_2.5", "tensors"):
        assert key in arts and (tmp_path / arts[key].split("/")[-1]).exists()
    saved = np.load(arts["tensors"])
    np.testing.assert_array_equal(saved["image_syn"], img)
    np.testing.assert_array_equal(saved["text_syn"], txt)
    decoded = open(arts["sentences"]).read().splitlines()
    assert len(decoded) == len(img) and set(decoded) <= set(sents)


def test_save_pt_reference_artifacts(tmp_path):
    """--save_pt writes the reference's torch tensor artifacts
    (images_{it}.pt / labels_{it}.pt, distill_original.py:292-296) in
    NCHW, exactly round-trippable back to the NHWC originals."""
    import torch

    img, txt = _syn()
    embed = np.random.RandomState(1).randn(5, 16).astype(np.float32)
    sents = [f"s{i}" for i in range(5)]
    arts = save_visualizations(str(tmp_path), 11, img, txt, sents, embed,
                               save_pt=True)
    assert "images_pt" in arts and "labels_pt" in arts
    imgs_pt = torch.load(str(tmp_path / "images_11.pt"), weights_only=True)
    assert tuple(imgs_pt.shape) == (img.shape[0], 3, 8, 8)  # NCHW
    np.testing.assert_array_equal(
        np.asarray(imgs_pt).transpose(0, 2, 3, 1), img)
    np.testing.assert_array_equal(
        np.asarray(torch.load(str(tmp_path / "labels_11.pt"),
                              weights_only=True)), txt)
    # default off: no .pt artifacts
    arts = save_visualizations(str(tmp_path), 12, img, txt, sents, embed)
    assert not (tmp_path / "images_12.pt").exists()


def test_save_pt_zca_live_fork_save(tmp_path):
    """Under ZCA, --save_pt also writes the fork's LIVE de-whitened
    images_zca_{it}.pt (distill.py:407-410)."""
    import torch

    from multimodal_dataset_distillation_tpu.ops.zca import ZCAWhitening

    rng = np.random.RandomState(2)
    fit = rng.randn(32, 8, 8, 3).astype(np.float32)
    zca = ZCAWhitening().fit(fit)
    img, txt = _syn()
    embed = np.random.RandomState(1).randn(5, 16).astype(np.float32)
    arts = save_visualizations(str(tmp_path), 5, img, txt,
                               [f"s{i}" for i in range(5)], embed,
                               zca=zca, save_pt=True)
    assert "images_zca_pt" in arts
    recon_pt = torch.load(str(tmp_path / "images_zca_5.pt"),
                          weights_only=True)
    np.testing.assert_allclose(
        np.asarray(recon_pt).transpose(0, 2, 3, 1),
        np.asarray(zca.inverse_transform(img), np.float32),
        rtol=1e-5, atol=1e-5)


def test_save_grids_gate_matches_reference(tmp_path):
    """ipc >= 50 without --force_save skips the PNG/sentence artifacts
    (distill.py:368) but still writes the distilled tensors (our fix for
    the reference's SURVEY §5.4 artifact gap)."""
    img, txt = _syn()
    embed = np.random.RandomState(1).randn(5, 16).astype(np.float32)
    sents = [f"s{i}" for i in range(5)]
    arts = save_visualizations(str(tmp_path), 3, img, txt, sents, embed,
                               save_grids=False)
    assert set(arts) == {"tensors"}
    assert not list(tmp_path.glob("*.png"))
    assert (tmp_path / "distilled_3.npz").exists()
