"""--dense_groups: block-diagonal dense rewrite of grouped convs.

The TPU perf lever (config.py dense_groups, models/layers.py
WSConv.expand_dense) must be EXACTLY the same function of the same
parameters: identical forward values and identical gradients w.r.t. both
the weights and the input, for every group count.  Verified in float64
(conftest enables x64 off-TPU) so any structural mistake — wrong block
placement, leaked off-block gradient, transposed group indexing — shows
up far above tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.models.layers import WSConv
from multimodal_dataset_distillation_tpu.models import nfnet


def _ws_pair(groups):
    conv = WSConv(features=16, kernel_size=(3, 3), feature_group_count=groups,
                  dtype=jnp.float64)
    dense = WSConv(features=16, kernel_size=(3, 3), feature_group_count=groups,
                   expand_dense=True, dtype=jnp.float64)
    return conv, dense


@pytest.mark.parametrize("groups", [1, 2, 4])
def test_wsconv_dense_matches_grouped(groups):
    with jax.enable_x64():
        conv, dense = _ws_pair(groups)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 8),
                        jnp.float64)
        params = conv.init(jax.random.PRNGKey(1), x)
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float64), params)
        y_g = conv.apply(params, x)
        y_d = dense.apply(params, x)  # same params: expansion is apply-time
        np.testing.assert_allclose(np.asarray(y_g), np.asarray(y_d),
                                   rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("groups", [2, 4])
def test_wsconv_dense_gradients_match(groups):
    with jax.enable_x64():
        conv, dense = _ws_pair(groups)
        x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 8),
                        jnp.float64)
        params = conv.init(jax.random.PRNGKey(3), x)
        # params are created float32 (WSConv pins the param dtype); cast
        # the tree so the gradient comparison runs at f64 precision
        params = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float64), params)

        def loss(m):
            def f(p, xx):
                return jnp.sum(jnp.sin(m.apply(p, xx)))
            return f

        gp_g, gx_g = jax.grad(loss(conv), argnums=(0, 1))(params, x)
        gp_d, gx_d = jax.grad(loss(dense), argnums=(0, 1))(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(gp_g),
                        jax.tree_util.tree_leaves(gp_d)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_d),
                                   rtol=1e-10, atol=1e-12)


def test_nf_tiny_dense_groups_forward_and_grad():
    """Whole-model check on the CI-sized NFNet (group_size=8): same
    params -> same features and same parameter gradients either way."""
    m_g = nfnet.nf_tiny()
    m_d = nfnet.nf_tiny(dense_groups=True)
    x = jnp.asarray(np.random.RandomState(4).randn(2, 32, 32, 3), jnp.float32)
    params = m_g.init(jax.random.PRNGKey(5), x)
    f_g = m_g.apply(params, x)
    f_d = m_d.apply(params, x)
    np.testing.assert_allclose(np.asarray(f_g), np.asarray(f_d),
                               rtol=2e-5, atol=2e-5)

    def loss(mod):
        return lambda p: jnp.sum(mod.apply(p, x) ** 2)

    g_g = jax.grad(loss(m_g))(params)
    g_d = jax.grad(loss(m_d))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_g),
                    jax.tree_util.tree_leaves(g_d)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_param_tree_identical():
    """dense_groups must not change parameter shapes (flat-vector/buffer
    layout compatibility — SURVEY.md §2.2 row 28)."""
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    p_g = nfnet.nf_tiny().init(jax.random.PRNGKey(0), x)
    p_d = nfnet.nf_tiny(dense_groups=True).init(jax.random.PRNGKey(0), x)
    sg = jax.tree_util.tree_map(lambda a: a.shape, p_g)
    sd = jax.tree_util.tree_map(lambda a: a.shape, p_d)
    assert sg == sd
