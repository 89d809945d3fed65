"""Flat-param round trip: ravel/unravel == identity (ReparamModule analog)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_dataset_distillation_tpu.models.projection import ProjectionHead
from multimodal_dataset_distillation_tpu.utils.flat import flatten_params, make_unravel


def test_roundtrip():
    m = ProjectionHead(embedding_dim=16, projection_dim=8)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    flat, unravel = flatten_params(params)
    rebuilt = unravel(flat)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(rebuilt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_apply_through_flat_vector_differentiable():
    m = ProjectionHead(embedding_dim=16, projection_dim=8)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    flat, unravel = flatten_params(params)
    x = jnp.ones((2, 16))

    def f(theta):
        out = m.apply({"params": unravel(theta)}, x, deterministic=True)
        return jnp.sum(out ** 2)

    g = jax.grad(f)(flat)
    assert g.shape == flat.shape
    assert bool(jnp.any(g != 0))


def test_size_matches():
    m = ProjectionHead(embedding_dim=16, projection_dim=8)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))["params"]
    n, _ = make_unravel(params)
    # 16*8+8 (projection) + 8*8+8 (fc) + 8+8 (layernorm)
    assert n == (16 * 8 + 8) + (8 * 8 + 8) + 16
