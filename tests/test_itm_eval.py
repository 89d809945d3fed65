"""itm_eval + top-k scoring on tiny synthetic score matrices with known ranks."""

import numpy as np
import jax.numpy as jnp

from multimodal_dataset_distillation_tpu.engine.eval import itm_eval, topk_score_matrix


def test_perfect_retrieval():
    # 3 images, 6 texts (2 per image); scores put the right texts on top
    scores_i2t = np.full((3, 6), -100.0)
    for i in range(3):
        scores_i2t[i, 2 * i] = 10.0
        scores_i2t[i, 2 * i + 1] = 9.0
    scores_t2i = np.full((6, 3), -100.0)
    for t in range(6):
        scores_t2i[t, t // 2] = 10.0
    img2txt = {i: [2 * i, 2 * i + 1] for i in range(3)}
    txt2img = {t: t // 2 for t in range(6)}
    r = itm_eval(scores_i2t, scores_t2i, txt2img, img2txt)
    assert r["txt_r1"] == 100.0 and r["img_r1"] == 100.0
    assert r["r_mean"] == 100.0


def test_known_rank():
    # image 0's correct text is ranked 2nd -> counts for R@5 not R@1
    scores_i2t = np.array([[5.0, 9.0, -100.0, -100.0]])
    scores_t2i = np.array([[9.0], [1.0], [1.0], [1.0]])
    img2txt = {0: [0]}
    txt2img = {0: 0, 1: 0, 2: 0, 3: 0}
    r = itm_eval(scores_i2t, scores_t2i, txt2img, img2txt)
    assert r["txt_r1"] == 0.0
    assert r["txt_r5"] == 100.0


def _itm_eval_reference_loop(scores_i2t, scores_t2i, txt2img, img2txt):
    """Verbatim re-statement of the reference's per-row argsort loop
    (epoch_original.py:114-161) as the tie-behavior oracle."""
    # kind="stable": the reference's default quicksort orders ties
    # arbitrarily (ties only exist inside the -100 masked block, whose
    # ranks are >= k_test and so can never move R@1/5/10 in production);
    # the vectorized formula reproduces the stable order exactly
    ranks = np.zeros(scores_i2t.shape[0])
    for index, score in enumerate(scores_i2t):
        inds = np.argsort(score, kind="stable")[::-1]
        ranks[index] = min(np.where(inds == i)[0][0] for i in img2txt[index])
    tr1 = 100.0 * np.sum(ranks < 1) / len(ranks)
    tr5 = 100.0 * np.sum(ranks < 5) / len(ranks)
    tr10 = 100.0 * np.sum(ranks < 10) / len(ranks)
    ranks = np.zeros(scores_t2i.shape[0])
    for index, score in enumerate(scores_t2i):
        inds = np.argsort(score, kind="stable")[::-1]
        ranks[index] = np.where(inds == txt2img[index])[0][0]
    ir1 = 100.0 * np.sum(ranks < 1) / len(ranks)
    ir5 = 100.0 * np.sum(ranks < 5) / len(ranks)
    ir10 = 100.0 * np.sum(ranks < 10) / len(ranks)
    tr_mean = (tr1 + tr5 + tr10) / 3
    ir_mean = (ir1 + ir5 + ir10) / 3
    return {"txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10,
            "txt_r_mean": tr_mean, "img_r1": ir1, "img_r5": ir5,
            "img_r10": ir10, "img_r_mean": ir_mean,
            "r_mean": (tr_mean + ir_mean) / 2}


def test_vectorized_matches_reference_loop_with_ties():
    """Random matrices with heavy -100 tie blocks (the top-k mask fill):
    the vectorized ranks must be bit-identical to the argsort loop."""
    from multimodal_dataset_distillation_tpu.engine.eval import (
        _ranks_desc, _ranks_desc_device, _tr_ranks_device, candidate_table,
        topk_score_matrix,
    )

    rng = np.random.RandomState(3)
    n_img, n_txt = 17, 85
    sims = rng.randn(n_img, n_txt).astype(np.float32)
    # duplicate some raw values to create non(-100) ties too
    sims[:, 40:45] = sims[:, :5]
    i2t = np.asarray(topk_score_matrix(jnp.asarray(sims), 9))
    t2i = np.asarray(topk_score_matrix(jnp.asarray(sims.T), 9))
    img2txt = {i: sorted(rng.choice(n_txt, 5, replace=False).tolist())
               for i in range(n_img)}
    txt2img = {t: int(rng.randint(n_img)) for t in range(n_txt)}

    got = itm_eval(i2t, t2i, txt2img, img2txt)
    want = _itm_eval_reference_loop(i2t, t2i, txt2img, img2txt)
    assert got == want

    # device twins agree with the numpy ranks exactly
    cands = candidate_table(img2txt, n_img)
    ir_targets = np.asarray([txt2img[t] for t in range(n_txt)])
    np.testing.assert_array_equal(
        np.asarray(_ranks_desc_device(jnp.asarray(t2i),
                                      jnp.asarray(ir_targets))),
        _ranks_desc(t2i, ir_targets))
    host_tr = np.min(np.stack(
        [_ranks_desc(i2t, cands[:, c]) for c in range(cands.shape[1])]), 0)
    np.testing.assert_array_equal(
        np.asarray(_tr_ranks_device(jnp.asarray(i2t), jnp.asarray(cands))),
        host_tr)


def test_retrieval_eval_matches_itm_eval():
    """Fused device path == epoch_test + itm_eval on a tiny real model."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.eval import (
        epoch_test, retrieval_eval,
    )
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder

    class _DS:
        pass

    class _Loader:
        def __init__(self, images, ds):
            self.images = images
            self.dataset = ds

        def __iter__(self):
            for i in range(0, len(self.images), 4):
                chunk = self.images[i:i + 4]
                yield chunk, np.arange(i, i + len(chunk))

    rng = np.random.RandomState(0)
    cfg = Config(image_encoder="convnet_tiny", image_size=32,
                 text_encoder_config="tiny")
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    ds = _DS()
    n_img, n_txt = 10, 30
    ds.img2txt = {i: [3 * i, 3 * i + 1, 3 * i + 2] for i in range(n_img)}
    ds.txt2img = {t: t // 3 for t in range(n_txt)}
    loader = _Loader(rng.randn(n_img, 32, 32, 3).astype(np.float32), ds)
    bert_test_embed = rng.randn(n_txt, model.text_embedding).astype(np.float32)

    i2t, t2i = epoch_test(loader, model, variables, bert_test_embed, k_test=7)
    want = itm_eval(i2t, t2i, ds.txt2img, ds.img2txt)
    got = retrieval_eval(loader, model, variables, bert_test_embed, k_test=7)
    assert got == want


def test_topk_matrix():
    sims = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    out = np.asarray(topk_score_matrix(sims, 2))
    # per row: top-2 kept, others -100
    assert (out[:, :2] == -100.0).all()
    np.testing.assert_allclose(out[:, 2:], np.asarray(sims)[:, 2:])
