"""--parallel_eval: all num_eval synset evaluations as one vmapped
program (engine/eval.py::evaluate_synset_parallel) vs the reference's
sequential loop (distill.py:303-328)."""

import numpy as np

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.data.datasets import SyntheticVLEval
from multimodal_dataset_distillation_tpu.data.pipeline import Loader
from multimodal_dataset_distillation_tpu.engine.eval import (
    evaluate_synset,
    evaluate_synset_parallel,
)
from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder


def _setup(num_eval=2):
    cfg = Config(image_encoder="convnet_tiny", image_size=16,
                 text_encoder_config="tiny", text_pretrained=False,
                 batch_train=4, epoch_eval_train=1, k_test=4,
                 batch_size_test=8, lr_net=0.05, seed=0,
                 synthetic_test_size=8, num_eval=num_eval)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    var_list = [init_bi_encoder(model, cfg.replace(seed=cfg.seed + 1000 + j))
                for j in range(num_eval)]
    rng = np.random.RandomState(0)
    images = rng.randn(8, 16, 16, 3).astype(np.float32)
    texts = rng.randn(8, 768).astype(np.float32)
    from multimodal_dataset_distillation_tpu.data.transforms import (
        make_test_transform,
    )

    ds = SyntheticVLEval(8, make_test_transform(16), image_size=16, seed=1)
    testloader = Loader(ds, batch_size=8, shuffle=False, drop_last=False,
                        num_workers=1)
    bert_test = rng.randn(len(ds.text), 768).astype(np.float32)
    return cfg, model, var_list, images, texts, testloader, bert_test


def test_parallel_eval_matches_sequential_structure():
    cfg, model, var_list, images, texts, testloader, bert_test = _setup(2)
    accs, results = evaluate_synset_parallel(
        2, model, var_list, images, texts, testloader, cfg, bert_test)
    assert len(results) == 2 and len(accs) == 2
    keys = {"txt_r1", "txt_r5", "txt_r10", "txt_r_mean",
            "img_r1", "img_r5", "img_r10", "img_r_mean", "r_mean"}
    for val, acc in zip(results, accs):
        assert set(val) == keys
        assert all(np.isfinite(v) for v in val.values())
        assert len(acc) == cfg.epoch_eval_train + 1
        assert all(np.isfinite(a) for a in acc)
    # different inits -> (almost surely) different end states
    assert results[0] != results[1] or accs[0] != accs[1]


def test_parallel_eval_rng_parity_with_sequential():
    """Per-model streams (dropout chain, batch order) now bit-match
    ``evaluate_synset(it_eval=j)``; end states agree to float tolerance
    (only XLA's vmapped scheduling differs)."""
    cfg, model, var_list, images, texts, testloader, bert_test = _setup(2)
    seq = []
    for j in range(2):
        _, acc, val = evaluate_synset(j, model, var_list[j], images, texts,
                                      testloader, cfg, bert_test)
        seq.append((acc, val))
    accs, results = evaluate_synset_parallel(
        2, model, var_list, images, texts, testloader, cfg, bert_test)
    for j in range(2):
        np.testing.assert_allclose(accs[j], seq[j][0], rtol=1e-4, atol=1e-5)
        for k in seq[j][1]:
            np.testing.assert_allclose(results[j][k], seq[j][1][k],
                                       atol=1e-6, err_msg=k)


def test_parallel_eval_under_mesh():
    """num_eval=8 synset evaluations sharded over an 8-device mesh."""
    from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh

    cfg, model, _, images, texts, testloader, bert_test = _setup(2)
    cfg = cfg.replace(num_eval=8)
    var_list = [init_bi_encoder(model, cfg.replace(seed=cfg.seed + 1000 + j))
                for j in range(8)]
    mesh = get_mesh((8,), ("data",))
    with mesh:
        accs, results = evaluate_synset_parallel(
            8, model, var_list, images, texts, testloader, cfg, bert_test,
            mesh=mesh)
    assert len(results) == 8
    for val in results:
        assert all(np.isfinite(v) for v in val.values())
    # different inits -> at least some distinct outcomes
    assert len({round(v["r_mean"], 4) for v in results}) > 1


def test_parallel_eval_tracks_sequential_metrics():
    """Dropout streams differ from the sequential path, so exact equality
    is not expected — but with the same inits and batch orders the
    retrieval metrics must land in the same range."""
    cfg, model, var_list, images, texts, testloader, bert_test = _setup(2)
    accs_p, res_p = evaluate_synset_parallel(
        2, model, var_list, images, texts, testloader, cfg, bert_test)
    res_s = []
    for j in range(2):
        _, acc, val = evaluate_synset(j, model, var_list[j], images, texts,
                                      testloader, cfg, bert_test)
        res_s.append(val)
    for vp, vs in zip(res_p, res_s):
        # r_mean on an 8-image eval moves in steps of ~4 points; allow a
        # generous band — this guards against wiring bugs (wrong model,
        # wrong lr, missing training), not dropout noise
        assert abs(vp["r_mean"] - vs["r_mean"]) < 40.0


def test_eval_reuse_matches_fresh():
    """The reuse path (one trainer re-armed across eval blocks — the
    long-run OOM/recompile fix; lr is a traced argument) must reproduce
    the fresh-trainer path bit-for-bit, including at a CHANGED lr_net
    (the learned syn_lr evolves between blocks)."""
    cfg, model, var_list, images, texts, testloader, bert_test = _setup(2)

    # fresh trainers, two blocks at different lrs (the old behavior)
    fresh = []
    for lr in (0.05, 0.07):
        c = cfg.replace(lr_net=lr)
        _, res = evaluate_synset_parallel(2, model, var_list, images, texts,
                                          testloader, c, bert_test)
        fresh.append(res)

    # one reused trainer across both blocks
    reuse = {}
    reused = []
    for lr in (0.05, 0.07):
        c = cfg.replace(lr_net=lr)
        _, res = evaluate_synset_parallel(2, model, var_list, images, texts,
                                          testloader, c, bert_test,
                                          reuse=reuse)
        reused.append(res)
    assert "trainer" in reuse  # actually cached

    for blk_f, blk_r in zip(fresh, reused):
        for vf, vr in zip(blk_f, blk_r):
            assert vf == vr, (vf, vr)

    # sequential path reuse parity too
    _, _, v_fresh = evaluate_synset(0, model, var_list[0], images, texts,
                                    testloader, cfg, bert_test)
    r2 = {}
    _, _, v_r1 = evaluate_synset(0, model, var_list[0], images, texts,
                                 testloader, cfg, bert_test, reuse=r2)
    _, _, v_r2 = evaluate_synset(0, model, var_list[0], images, texts,
                                 testloader, cfg, bert_test, reuse=r2)
    assert v_fresh == v_r1 == v_r2
