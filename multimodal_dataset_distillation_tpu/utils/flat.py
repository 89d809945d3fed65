"""Flat-parameter utilities — ReparamModule, the JAX-native way.

The reference's ``ReparamModule`` (``reparam_module.py:9-159``) flattens a
torch module's params into one vector and fakes a functional
``forward(x, flat_param=theta)`` by re-registering views.  In JAX this is
simply ``jax.flatten_util.ravel_pytree``: ``apply(unravel(theta), x)`` is
already pure and differentiable through ``theta``.  These helpers pin the
canonical flattening order so expert trajectories, distillation students,
and buffer files all agree.

Like the reference (``reparam_module.py:67-74``), only *parameters* are
flattened — mutable collections (e.g. BatchNorm ``batch_stats``) ride
alongside, never inside the matched vector.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def flatten_params(params: Any) -> Tuple[jnp.ndarray, Callable[[jnp.ndarray], Any]]:
    """(flat_vector, unravel_fn); order = jax pytree leaf order (stable)."""
    flat, unravel = ravel_pytree(params)
    return flat, unravel


def make_unravel(params_template: Any) -> Tuple[int, Callable[[jnp.ndarray], Any]]:
    """Size + unravel fn for a parameter template (shape-only use)."""
    flat, unravel = ravel_pytree(params_template)
    return int(flat.size), unravel


def param_count(params: Any) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
