"""Symmetric InfoNCE contrastive loss, accuracy, and normalization.

Pure functions replacing the loss math embedded in the reference model
forward (``networks.py:845-889``) and the distillation inner loop
(``distill_original.py:413-438``, ``distill.py:509-583``).

Logit-scale conventions in the reference (both supported):

* model forward + retrieval eval use ``exp(log(1/0.07)) ~= 14.2857``
  (``networks.py:881``, ``epoch_original.py:94``) -> :data:`FIXED_LOGIT_SCALE`
* the upstream inner loop uses the *unexponentiated* parameter value
  ``log(1/0.07) ~= 2.6593`` (``distill_original.py:103,430``)
  -> :data:`RAW_LOG_SCALE`
* the fork's inner loop uses the learnable inner LR as the scale
  (``distill.py:548``) -> pass ``syn_lr_img`` as ``scale``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# exp(log(1/0.07)) == 1/0.07
FIXED_LOGIT_SCALE: float = 1.0 / 0.07
# raw log(1/0.07), used unexponentiated by the upstream inner loop
RAW_LOG_SCALE: float = math.log(1.0 / 0.07)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 0.0) -> jnp.ndarray:
    """Row-normalize ``x`` (reference: ``x / x.norm(dim=1, keepdim=True)``).

    ``eps=0`` matches torch semantics exactly (NaN on a zero row); callers
    on hot paths may pass a tiny eps.
    """
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return x / norm


def _symmetric_ce(logits: jnp.ndarray,
                  mask: "jnp.ndarray | None" = None,
                  n_valid: "int | None" = None) -> jnp.ndarray:
    """(CE(logits, diag) + CE(logits.T, diag)) / 2 with diagonal targets.

    ``mask`` (0/1 per batch row, padding at the tail) makes the loss over
    a PADDED batch exactly equal the unpadded loss: pad columns are
    excluded from each softmax (driven to a large negative so their
    probability underflows to exactly 0) and pad rows carry zero weight.
    ``n_valid`` is the static count of real rows (the mean denominator).
    Used for non-divisible minibatches on a device mesh — the TPU
    counterpart of DataParallel's uneven scatter (distill.py:443-445).
    """
    n = logits.shape[0]
    labels = jnp.arange(n)
    if mask is None:
        log_p_i2t = jax.nn.log_softmax(logits, axis=1)
        log_p_t2i = jax.nn.log_softmax(logits, axis=0)
        loss_i2t = -jnp.mean(
            jnp.take_along_axis(log_p_i2t, labels[:, None], axis=1))
        loss_t2i = -jnp.mean(
            jnp.take_along_axis(log_p_t2i, labels[None, :], axis=0))
        return (loss_i2t + loss_t2i) / 2.0
    # finite large-negative (not -inf: keeps log_softmax grads NaN-free);
    # after max-subtraction exp() underflows to exactly 0 for pad entries
    big_neg = jnp.asarray(jnp.finfo(logits.dtype).max, logits.dtype) * -0.5
    m = mask.astype(logits.dtype)
    log_p_i2t = jax.nn.log_softmax(
        jnp.where(m[None, :] > 0, logits, big_neg), axis=1)
    log_p_t2i = jax.nn.log_softmax(
        jnp.where(m[:, None] > 0, logits, big_neg), axis=0)
    diag_i2t = jnp.take_along_axis(log_p_i2t, labels[:, None], axis=1)[:, 0]
    diag_t2i = jnp.take_along_axis(log_p_t2i, labels[None, :], axis=0)[0, :]
    nv = float(n_valid) if n_valid is not None else jnp.sum(m)
    loss_i2t = -jnp.sum(diag_i2t * m) / nv
    loss_t2i = -jnp.sum(diag_t2i * m) / nv
    return (loss_i2t + loss_t2i) / 2.0


def info_nce(img_emb: jnp.ndarray, txt_emb: jnp.ndarray,
             scale: jnp.ndarray | float = FIXED_LOGIT_SCALE,
             normalize: bool = True) -> jnp.ndarray:
    """Symmetric InfoNCE loss over an (already-projected) embedding batch."""
    if normalize:
        img_emb = l2_normalize(img_emb)
        txt_emb = l2_normalize(txt_emb)
    logits = scale * jnp.dot(img_emb, txt_emb.T,
                             preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return _symmetric_ce(logits)


def contrastive_loss_and_acc(
    img_emb: jnp.ndarray, txt_emb: jnp.ndarray,
    scale: jnp.ndarray | float = FIXED_LOGIT_SCALE,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Loss + the reference's accuracy measure (networks.py:884-887).

    acc = (|argmax_rows(logits)==diag| + |argmax_cols(logits)==diag|) / 2,
    an un-normalized *count* averaged over the two directions, exactly as
    the reference returns it (the caller divides by dataset size).
    """
    if normalize:
        img_emb = l2_normalize(img_emb)
        txt_emb = l2_normalize(txt_emb)
    logits = scale * jnp.dot(img_emb, txt_emb.T,
                             preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    loss = _symmetric_ce(logits)
    labels = jnp.arange(logits.shape[0])
    acc_i = jnp.sum(jnp.argmax(logits, axis=1) == labels)
    acc_t = jnp.sum(jnp.argmax(logits, axis=0) == labels)
    acc = (acc_i + acc_t) / 2.0
    return loss, acc
