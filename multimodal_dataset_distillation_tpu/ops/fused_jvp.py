"""Merged-tangent convolution for the grad-of-jvp meta-backward.

The forward-HVP backward (``engine/distill.py`` ``fr_bwd="rof"``) is a
reverse pass over ``jax.jvp(closs)`` with tangents on the student
parameters.  Under JAX's default conv JVP every conv site emits THREE
convolutions::

    P  = conv(x,  w)      # primal
    T1 = conv(dx, w)      # activation-tangent term
    T2 = conv(x,  dw)     # weight-tangent term

and the subsequent transpose doubles each again — ``x`` is read twice in
the tangent forward (P and T2) and twice more in the two weight-gradient
convs of the reverse pass.  On the headline NFNet-L0 step the conv
fusions are the measured bottleneck (851 ms/step, ~70% of HBM peak —
DESIGN.md §10), so those duplicate activation reads are the one
*algorithmic* byte reduction the §10 lever table never tried.

This module provides a :func:`jax.custom_jvp` conv whose rule computes
the share-``x`` pair as ONE convolution with per-group doubled output
channels::

    ym   = conv(x, [w ‖ dw])          # per-group concat along out-ch
    P, Z = split(ym);  dy = Z + conv(dx, w)

which (a) reads ``x`` once instead of twice in the tangent forward,
(b) transposes to ONE dgrad and ONE wgrad on the concatenated cotangent
``[ct_y ‖ ct_z]`` instead of two of each (``x`` read once in the merged
wgrad), and (c) doubles the per-group output width of the NF grouped
3x3s from 64 to 128 — exactly filling the 128-lane MXU that the
measured grouped-conv granularity ceiling is about (DESIGN.md §10.1).
Measured on a 2-layer probe: optimized-HLO conv count 13 -> 9 for one
grad-of-jvp; exact to f64 round-off (the per-output-channel arithmetic
of a conv is independent of the other channels, so the merged form is
the same sums in the same order).

Scoping rule (IMPORTANT): the merged rule computes the *primal* output
from a conv whose kernel contains the tangent, so it can only be used
where tangents are concrete values — i.e. inside a ``jax.jvp`` call
with real tangent arrays (the rof ``h_fn``).  Taking plain reverse-mode
``jax.grad`` *through* the custom conv fails with "Linearization failed
to produce known values for all output primals" (the partial-eval
cannot separate the primal from the unknown tangent).  The
:func:`activate` context manager therefore gates the routing at Python
trace time: ``WSConv`` only routes to :func:`conv` while the distiller
is tracing the inner jvp of the meta-backward; every other path (the
inner first-order gradient, expert training, eval) traces the plain
``lax.conv_general_dilated``.

Reference context: the torch reference pays this same backward via
``autograd.grad(create_graph=True)`` (``distill_original.py:413-438``)
with no analogous fusion; this is a TPU-side structural win, not a
translation.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_ACTIVE = False


def resolve(cfg) -> bool:
    """cfg.fused_jvp with the MDD_FUSED_JVP env override (bench A/Bs)."""
    from multimodal_dataset_distillation_tpu.utils.env import env_bool

    env = env_bool("MDD_FUSED_JVP")
    if env is not None:
        return env
    return bool(getattr(cfg, "fused_jvp", False))


def active() -> bool:
    """True while tracing inside an :func:`activate` block."""
    return _ACTIVE


@contextlib.contextmanager
def activate(on: bool = True):
    """Route WSConv through the merged-tangent conv while tracing.

    Trace-time scoping is sound because JAX tracing executes module
    Python synchronously: the flag is observed exactly by the ops traced
    lexically inside the ``with`` block (the inner ``jax.jvp`` of the
    rof backward), never by the transpose pass, which is generated from
    the already-built jaxpr.
    """
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = bool(on)
    try:
        yield
    finally:
        _ACTIVE = prev


def _merge_kernels(w: jnp.ndarray, dw: jnp.ndarray,
                   groups: int) -> jnp.ndarray:
    """Per-group concat of ``w`` and ``dw`` along the output-channel dim.

    HWIO kernels put group ``i``'s output channels at the contiguous
    slice ``[i*opg:(i+1)*opg]``; a plain concat would hand group ``i``
    the wrong kernel halves, so the concat happens inside each group:
    the merged kernel maps group ``i`` to ``[w_gi ‖ dw_gi]``.
    """
    kh, kw, ing, out = w.shape
    opg = out // groups
    wm = jnp.concatenate(
        [w.reshape(kh, kw, ing, groups, opg),
         dw.reshape(kh, kw, ing, groups, opg)], axis=-1)
    return wm.reshape(kh, kw, ing, 2 * out)


def _split_out(ym: jnp.ndarray, groups: int,
               out: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Undo :func:`_merge_kernels` on the conv output's channel dim."""
    opg = out // groups
    s = ym.shape[:-1]
    ym = ym.reshape(*s, groups, 2 * opg)
    return (ym[..., :opg].reshape(*s, out),
            ym[..., opg:].reshape(*s, out))


@functools.lru_cache(maxsize=None)
def _make_conv(strides: Tuple[int, int], padding: Any, groups: int):
    def raw(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=strides, padding=padding,
            feature_group_count=groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.custom_jvp
    def conv(x, w):
        return raw(x, w)

    @functools.partial(conv.defjvp, symbolic_zeros=True)
    def conv_jvp(primals, tangents):
        x, w = primals
        dx, dw = tangents
        zero = jax.custom_derivatives.SymbolicZero
        dx_zero = isinstance(dx, zero)
        dw_zero = isinstance(dw, zero)
        if dw_zero and dx_zero:  # unreachable in practice; keep total
            y = raw(x, w)
            return y, jnp.zeros_like(y)
        if dw_zero:  # no weight tangent: nothing to merge
            return raw(x, w), raw(dx, w)
        out = w.shape[-1]
        ym = raw(x, _merge_kernels(w, dw, groups))
        y, z = _split_out(ym, groups, out)
        if dx_zero:  # first conv of the tower: x carries no tangent
            return y, z
        return y, z + raw(dx, w)

    return conv


def conv(x: jnp.ndarray, w: jnp.ndarray, strides: Tuple[int, int],
         padding: Any, groups: int = 1) -> jnp.ndarray:
    """NHWC/HWIO conv with the merged-tangent custom JVP rule.

    Same signature semantics as the ``lax.conv_general_dilated`` call in
    ``models/layers.py::WSConv``; only call under :func:`activate` (see
    the module docstring for why plain reverse-mode through this fails).
    """
    if isinstance(padding, list):
        padding = tuple(tuple(p) for p in padding)
    return _make_conv(tuple(strides), padding, groups)(x, w)
