"""Contrastive loss/acc vs hand-computed values and torch parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_dataset_distillation_tpu.ops.contrastive import (
    FIXED_LOGIT_SCALE,
    RAW_LOG_SCALE,
    contrastive_loss_and_acc,
    info_nce,
    l2_normalize,
)


def test_scales():
    assert abs(FIXED_LOGIT_SCALE - np.exp(np.log(1 / 0.07))) < 1e-9
    assert abs(RAW_LOG_SCALE - np.log(1 / 0.07)) < 1e-12


def test_l2_normalize_rows():
    x = np.random.randn(4, 7).astype(np.float32)
    y = np.asarray(l2_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), 1.0, rtol=1e-5)


def test_identical_embeddings_loss():
    # identical normalized embeddings -> logits = scale * ones off-diag? no:
    # x @ x.T with x orthonormal rows = I -> known CE
    n, d = 4, 8
    x = np.eye(n, d).astype(np.float32)
    loss = float(info_nce(jnp.asarray(x), jnp.asarray(x), scale=1.0))
    # logits = I; CE = -log(softmax diag) = log(sum exp row) - 1
    row = np.array([1.0] + [0.0] * (n - 1))
    expected = -np.log(np.exp(1.0) / (np.exp(1.0) + (n - 1)))
    assert abs(loss - expected) < 1e-5


def test_torch_parity():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    np.random.seed(1)
    a = np.random.randn(6, 16).astype(np.float32)
    b = np.random.randn(6, 16).astype(np.float32)
    loss_jax, acc_jax = contrastive_loss_and_acc(jnp.asarray(a), jnp.asarray(b))

    ta, tb = torch.tensor(a), torch.tensor(b)
    ta = ta / ta.norm(dim=1, keepdim=True)
    tb = tb / tb.norm(dim=1, keepdim=True)
    logits = float(np.exp(np.log(1 / 0.07))) * ta @ tb.t()
    gt = torch.arange(6)
    loss_t = (F.cross_entropy(logits, gt) + F.cross_entropy(logits.t(), gt)) / 2
    acc_t = ((logits.argmax(1) == gt).sum().item()
             + (logits.argmax(0) == gt).sum().item()) / 2

    assert abs(float(loss_jax) - float(loss_t)) < 1e-4
    assert float(acc_jax) == acc_t
