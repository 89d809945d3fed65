"""Pallas kernel parity vs the XLA reference (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_dataset_distillation_tpu.ops.contrastive import FIXED_LOGIT_SCALE
from multimodal_dataset_distillation_tpu.ops.pallas_kernels import (
    FILL,
    topk_scores_pallas,
    topk_scores_reference,
)


def _embs(m, n, d, seed=0):
    rng = np.random.RandomState(seed)
    a = rng.randn(m, d).astype(np.float32)
    b = rng.randn(n, d).astype(np.float32)
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    b /= np.linalg.norm(b, axis=1, keepdims=True)
    return jnp.asarray(a), jnp.asarray(b)


@pytest.mark.parametrize("m,n,d,k", [(16, 64, 8, 4), (40, 128, 16, 16)])
def test_topk_scores_matches_reference(m, n, d, k):
    img, txt = _embs(m, n, d)
    ref = np.asarray(topk_scores_reference(img, txt, k, FIXED_LOGIT_SCALE))
    out = np.asarray(topk_scores_pallas(img, txt, k, FIXED_LOGIT_SCALE,
                                        block_rows=16, interpret=True))
    # kept entries agree to float tolerance; same kept-mask up to ties
    kept_ref = ref > FILL
    kept_out = out > FILL
    # tie-tolerance: counts per row within 1 of k and values match where both kept
    assert (np.abs(kept_out.sum(1) - k) <= 1).all()
    both = kept_ref & kept_out
    np.testing.assert_allclose(out[both], ref[both], rtol=1e-4, atol=1e-5)
    # ranking equivalence: the max per row is identical
    np.testing.assert_allclose(out.max(1), ref.max(1), rtol=1e-5)


def test_k_larger_than_cols():
    img, txt = _embs(8, 4, 8)
    out = np.asarray(topk_scores_pallas(img, txt, 128, 1.0, interpret=True))
    # nothing masked when k >= N
    assert (out > FILL).all()


def test_row_padding():
    # m not a multiple of block_rows exercises the pad/slice path
    img, txt = _embs(10, 32, 8)
    ref = np.asarray(topk_scores_reference(img, txt, 4, 1.0))
    out = np.asarray(topk_scores_pallas(img, txt, 4, 1.0, block_rows=4,
                                        interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out.max(1), ref.max(1), rtol=1e-5)
