"""Table-D transfer-eval wiring: distilled data evaluated cross-tower.

Reference mechanics (``distill_original.py:222``: the eval net is
``CLIPModel_full(args, eval_stage=args.transfer)``; Table D of the paper
evaluates distilled sets under different backbone pairs).  The distilled
IMAGES are raw pixels and the eval model's text projection is trained
from scratch on the synthetic set (``epoch_original.py:164-195``), so
any eval image tower with matching text dims can consume a saved set —
this framework's ``eval_distilled`` CLI is the vehicle.  These tests pin
that wiring offline; ``tools/quality_transfer.sh`` is the recorded
end-to-end rehearsal (QUALITY.md).
"""

import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.models.clip_model import (
    build_bi_encoder,
)


def _fake_distilled_npz(tmp_path, n=8, size=16):
    rng = np.random.RandomState(0)
    path = str(tmp_path / "distilled_5.npz")
    np.savez(path,
             image_syn=rng.randn(n, size, size, 3).astype(np.float32),
             text_syn=rng.randn(n, 128).astype(np.float32),
             syn_lr_img=np.float32(0.05), syn_lr_txt=np.float32(0.05))
    return path


@pytest.mark.parametrize("eval_encoder,image_embedding", [
    ("convnet_tiny", 64),    # cross-architecture (Table D row mechanics)
    ("nf_tiny", 128),        # same-family control
])
def test_eval_distilled_cross_tower(tmp_path, eval_encoder,
                                    image_embedding, monkeypatch):
    """A distilled set (made with one tower) evaluates under another
    eval tower end to end through the eval_distilled CLI main()."""
    from multimodal_dataset_distillation_tpu.cli import eval_distilled

    monkeypatch.chdir(tmp_path)  # text-embed npz cache lands in CWD
    npz = _fake_distilled_npz(tmp_path)
    cfg = Config(dataset="synthetic", synthetic_size=16,
                 synthetic_test_size=8, image_size=16,
                 image_encoder=eval_encoder, text_encoder="bert",
                 text_encoder_config="tiny", distilled_npz=npz,
                 num_eval=2, epoch_eval_train=1, batch_train=4,
                 batch_size_test=8, parallel_eval=False, seed=0)
    results = eval_distilled.main(cfg)
    assert len(results) == 2
    for val in results:
        for k in ("txt_r1", "img_r1", "r_mean"):
            assert k in val and np.isfinite(val[k])


def test_transfer_flag_builds_eval_stage_tower():
    """--transfer: the nfnet eval tower gets its 1000-class head
    (reference eval_stage semantics, networks.py:810-812 dim table)."""
    cfg = Config(image_encoder="nfnet", transfer=True)
    model = build_bi_encoder(cfg)
    assert model.transfer is True
    assert model.image_embedding == 1000  # nfnet_transfer dim
    plain = build_bi_encoder(Config(image_encoder="nfnet"))
    assert plain.image_embedding == 2304


def test_eval_pool_grammar_covers_reference_modes():
    """get_eval_pool (utils.py:336-360) mode grammar sanity — the pool
    surface behind --eval_mode."""
    from multimodal_dataset_distillation_tpu.models import zoo

    assert zoo.get_eval_pool("S", "ConvNet", "x") == ["ConvNet"]
    assert len(zoo.get_eval_pool("M", "m", "x")) == 5
    pool = zoo.get_eval_pool("C", "ResNet18", "x")
    assert pool[0] == "ResNet18" and "ConvNet" in pool
