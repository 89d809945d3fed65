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


def test_topk_matrix():
    sims = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    out = np.asarray(topk_score_matrix(sims, 2))
    # per row: top-2 kept, others -100
    assert (out[:, :2] == -100.0).all()
    np.testing.assert_allclose(out[:, 2:], np.asarray(sims)[:, 2:])
