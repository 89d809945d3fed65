"""Pallas TPU kernels for the retrieval-scoring hot path.

The retrieval evaluator (``epoch_original.py:94-105``) computes
``sims = scale * img @ txt.T`` and keeps only the top-k entries per row
(k_test=128), filling the rest with -100.  On COCO that matrix is
5,000 x 25,010 both directions; the naive path materializes it twice in
HBM (once raw, once masked).  The fused kernel below computes one row-tile
of the similarity matrix in VMEM (MXU matmul over the embedding dim) and
writes the masked scores directly — a single HBM pass over the output and
no intermediate full matrix.

Threshold-based masking: keeping "top-k values in place, others -100" is
equivalent to finding the k-th largest value per row and writing
``where(sims >= kth, sims, -100)`` (modulo ties at the k-th value, which
the rank-based ``itm_eval`` treats identically — tied scores are
interchangeable under argsort ranking).  The k-th value per row-tile is
found with a vectorized binary search on the VPU, avoiding any sort.

Kernels run compiled on TPU and in interpreter mode on CPU (tests).

STATUS (round-3 measurement, tools/bench_eval.py on v5e-1): the XLA
matmul + two-pass top-k path scores the COCO-shape matrix in <1 ms, and
this kernel's whole-``txt``-operand VMEM BlockSpec cannot fit COCO's
25k x 2304 f32 (~230 MB) — it fails to compile at exactly the scale the
fused design targeted.  The eval engine therefore no longer auto-selects
it (``MDD_EVAL_PALLAS=1`` opts in for small shapes); the real eval
bottleneck was ranking, fixed on-device in ``engine/eval.py``
(9.9 s -> 40 ms per direction).  A production rewrite would stream txt
column-tiles via double-buffered DMA (pallas_guide: Double Buffering)
and carry running row top-k state across column tiles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FILL = -100.0


def _kth_largest_rowwise(tile: jnp.ndarray, k: int, iters: int = 30) -> jnp.ndarray:
    """Per-row k-th largest via binary search on values (VPU-only).

    Returns a (rows, 1) threshold t s.t. |{x >= t}| >= k and
    |{x > t}| <= k-ish; exact enough for tie-equivalent top-k masking.
    """
    lo = jnp.min(tile, axis=1, keepdims=True)
    hi = jnp.max(tile, axis=1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) * 0.5
        count = jnp.sum((tile >= mid).astype(jnp.int32), axis=1,
                        keepdims=True)
        new_lo = jnp.where(count >= k, mid, lo)
        new_hi = jnp.where(count >= k, hi, mid)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def _scored_topk_kernel(img_ref, txt_ref, out_ref, *, k: int, scale: float):
    """One row-tile: sims = scale * img_tile @ txt^T, masked to top-k."""
    sims = scale * jnp.dot(img_ref[:], txt_ref[:].T,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    kth = _kth_largest_rowwise(sims, k)
    out_ref[:] = jnp.where(sims >= kth, sims, FILL)


def topk_scores_pallas(img: jnp.ndarray, txt: jnp.ndarray, k: int,
                       scale: float, block_rows: int = 256,
                       interpret: Optional[bool] = None) -> jnp.ndarray:
    """Masked top-k score matrix (rows = img, cols = txt), fused in VMEM.

    img: (M, D) l2-normalized; txt: (N, D) l2-normalized.  Output (M, N)
    with top-k per row kept (scaled), others -100.
    """
    m, d = img.shape
    n = txt.shape[0]
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    rows = min(block_rows, m)
    # pad rows to a multiple of the tile
    pad_m = (-m) % rows
    if pad_m:
        img = jnp.pad(img, ((0, pad_m), (0, 0)))
    grid = ((m + pad_m) // rows,)

    out = pl.pallas_call(
        functools.partial(_scored_topk_kernel, k=min(k, n), scale=scale),
        out_shape=jax.ShapeDtypeStruct((m + pad_m, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(img.astype(jnp.float32), txt.astype(jnp.float32))
    return out[:m]


def topk_scores_reference(img: jnp.ndarray, txt: jnp.ndarray, k: int,
                          scale: float) -> jnp.ndarray:
    """XLA reference implementation (exact top-k) for parity checks."""
    sims = scale * jnp.dot(img, txt.T, preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    k = min(k, sims.shape[1])
    vals, idx = jax.lax.top_k(sims, k)
    out = jnp.full(sims.shape, FILL, sims.dtype)
    rows = jnp.arange(sims.shape[0])[:, None]
    return out.at[rows, idx].set(vals)
