"""ZCA whitening (replaces the kornia dependency; utils.py:70-98).

Fit on a dataset of images, transform/inverse-transform batches.  Used on
the CIFAR path with ``--zca`` (``utils.py:50-105``; inverse on saved
synthetic images, ``distill.py:407-426``).

Pure numpy/JAX: covariance in float64 for stability, whitening matrix
W = U diag((s+eps)^-1/2) U^T applied per-pixel-channel feature.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ZCAWhitening:
    def __init__(self, eps: float = 0.1):
        self.eps = eps
        self.mean: Optional[np.ndarray] = None
        self.whiten: Optional[np.ndarray] = None
        self.dewhiten: Optional[np.ndarray] = None

    def fit(self, images: np.ndarray) -> "ZCAWhitening":
        """images: (N, H, W, C) float."""
        n = images.shape[0]
        flat = images.reshape(n, -1).astype(np.float64)
        self.mean = flat.mean(axis=0)
        x = flat - self.mean
        cov = (x.T @ x) / (n - 1)
        s, u = np.linalg.eigh(cov)
        s = np.maximum(s, 0.0)
        inv_sqrt = 1.0 / np.sqrt(s + self.eps)
        self.whiten = (u * inv_sqrt) @ u.T
        self.dewhiten = (u * np.sqrt(s + self.eps)) @ u.T
        return self

    def transform(self, images: np.ndarray) -> np.ndarray:
        shape = images.shape
        flat = images.reshape(shape[0], -1).astype(np.float64) - self.mean
        return (flat @ self.whiten).reshape(shape).astype(np.float32)

    def inverse_transform(self, images: np.ndarray) -> np.ndarray:
        shape = images.shape
        flat = images.reshape(shape[0], -1).astype(np.float64)
        return ((flat @ self.dewhiten) + self.mean).reshape(shape).astype(
            np.float32)
