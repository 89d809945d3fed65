"""ProjectionHead — the trainable text pathway.

Reference: ``networks.py:625-646``:
Linear(emb -> proj) -> GELU -> Linear(proj -> proj) -> Dropout(0.1)
-> residual add of the first projection -> LayerNorm.

For bert -> nfnet this is 768 -> 2304 (~7.1M params) and is the *entire*
trainable text tower in both phases.  GELU is exact (torch default), not
the tanh approximation.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class ProjectionHead(nn.Module):
    embedding_dim: int
    projection_dim: int = 768
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        projected = nn.Dense(self.projection_dim, name="projection")(x)
        h = jax.nn.gelu(projected, approximate=False)
        h = nn.Dense(self.projection_dim, name="fc")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = h + projected
        # epsilon=1e-5: torch nn.LayerNorm default (the reference's head,
        # networks.py:645); flax's default is 1e-6
        return nn.LayerNorm(epsilon=1e-5, name="layer_norm")(h)
