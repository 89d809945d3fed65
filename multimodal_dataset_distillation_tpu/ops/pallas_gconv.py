"""Pallas TPU kernels for NFNet's grouped 3x3 convolutions.

Why this exists (round-3 perf campaign, DESIGN.md §10.1): in the
headline distill step the grouped 3x3 convs of NFNet-L0's stage-2/3/4
bottlenecks (``models/nfnet.py`` conv2/conv2b, group width 64 — the
reference builds them with timm's grouped Conv2d via
``/root/reference/networks.py:666``) are the one conv class that is slow
even *standalone*: XLA lowers ``feature_group_count>1`` to a rank-5
"groups as an extra spatial dim" kernel whose matmuls contract K=64 over
N=64 lanes — a 25% MXU-granularity ceiling (~46 TFLOPS / 260-510 GB/s
measured, ``tools/conv_micro.py``).  Rewriting each group as an im2col
matmul lifts the contraction to K = 9*64 = 576 (full MXU depth) at
N=64, doubling the per-kernel ceiling; the block-diagonal *dense*
rewrite tried earlier paid 6x FLOPs and lost (DESIGN.md §10 round-3
table) — this kernel keeps the grouped FLOP count.

Scope is deliberately narrow: **stride-1, SAME-padded 3x3 grouped convs
in NHWC/HWIO** — exactly NFNet's non-transition grouped convs.  Strided
transition blocks and every other conv stay on XLA's native path.

The op is exposed as a proper JAX primitive pair (spatial + wgrad),
each bilinear with JVP and transpose rules written in terms of the
other — so it is differentiable to arbitrary order, which the distill
step requires (the meta-backward is a JVP *through* the inner VJP,
``engine/distill.py`` forward-HVP).  Non-TPU platforms lower to
``lax.conv_general_dilated``, so CPU tests and the virtual multi-chip
dry-run see identical semantics; vmap falls back to the lax path (the
parallel expert/eval vmaps batch the *weights*, which the kernel does
not tile for).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.interpreters import ad, batching, mlir

try:  # modern public location
    from jax.extend.core import Primitive
except ImportError:  # pragma: no cover - older jax
    from jax.core import Primitive

TAPS = tuple((dy, dx) for dy in range(3) for dx in range(3))

# trace-time switch: models read this when building the conv (WSConv in
# models/layers.py).  The CLIs call set_enabled(cfg.pallas_gconv);
# MDD_PALLAS_GCONV=0/1 overrides either way.  Enabling is semantically
# safe on every platform (non-TPU lowers to the lax reference) — the
# switch only exists so the XLA-native path stays one flag away, and
# because a >1-device GSPMD mesh cannot partition the pallas call (the
# CLIs force it off there; single-chip TPU is the bench/production
# target this kernel serves).
_ENABLED = False


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def enabled() -> bool:
    import os
    env = os.environ.get("MDD_PALLAS_GCONV")
    if env is not None:
        return env == "1"
    return _ENABLED


# ---------------------------------------------------------------------------
# reference semantics (also the non-TPU lowering)
# ---------------------------------------------------------------------------

def _ref_spatial(x: jnp.ndarray, w: jnp.ndarray, *, groups: int) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _ref_wgrad(x: jnp.ndarray, ybar: jnp.ndarray, *, groups: int) -> jnp.ndarray:
    cpg = x.shape[-1] // groups
    w_shape = (3, 3, cpg, ybar.shape[-1])
    zero_w = jnp.zeros(w_shape, x.dtype)
    _, vjp = jax.vjp(lambda w: _ref_spatial(x, w, groups=groups), zero_w)
    return vjp(ybar)[0]


# ---------------------------------------------------------------------------
# pallas kernels
# ---------------------------------------------------------------------------

def _pick_tile(n: int, h: int, w: int, c: int, itemsize: int) -> int:
    """Largest divisor of n whose per-program VMEM stays ~<10 MB."""
    best = 1
    for tn in range(1, n + 1):
        if n % tn:
            continue
        m = tn * h * w
        vmem = (tn * (h + 2) * (w + 2) * c * itemsize      # padded input
                + m * 9 * 64 * itemsize                     # im2col (1 group)
                + 2 * 2 * tn * h * w * c * itemsize)        # dbl-buffered io
        if vmem < 10 * 2**20:
            best = tn
    return best


def _spatial_kernel(x_ref, w_ref, o_ref, xp_ref, cols_ref, *, groups: int):
    tn, h, w, c = x_ref.shape
    cpg = c // groups
    opg = o_ref.shape[-1] // groups
    m = tn * h * w
    xp_ref[:] = jnp.zeros_like(xp_ref)
    xp_ref[:, 1:h + 1, 1:w + 1, :] = x_ref[:]
    for g in range(groups):
        for t, (dy, dx) in enumerate(TAPS):
            cols_ref[:, t * cpg:(t + 1) * cpg] = (
                xp_ref[:, dy:dy + h, dx:dx + w, g * cpg:(g + 1) * cpg]
                .reshape(m, cpg))
        wmat = w_ref[:, :, :, g * opg:(g + 1) * opg].reshape(9 * cpg, opg)
        y = jnp.dot(cols_ref[:], wmat, preferred_element_type=jnp.float32)
        o_ref[:, :, :, g * opg:(g + 1) * opg] = (
            y.astype(o_ref.dtype).reshape(tn, h, w, opg))


def _pallas_spatial(x, w, *, groups: int, interpret: bool = False):
    n, h, wd, c = x.shape
    cpg = c // groups
    feats = w.shape[-1]
    tn = _pick_tile(n, h, wd, c, x.dtype.itemsize)
    m = tn * h * wd
    grid = (n // tn,)
    return pl.pallas_call(
        functools.partial(_spatial_kernel, groups=groups),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, feats), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, h, wd, c), lambda nb: (nb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cpg, feats), lambda nb: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, h, wd, feats), lambda nb: (nb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tn, h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((m, 9 * cpg), x.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * feats * 9 * cpg,
            bytes_accessed=(x.size + w.size + n * h * wd * feats)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w)


def _spatial_kernel_dma(x_ref, w_ref, o_ref, xp_ref, cols_ref, y_ref,
                        sems, *, groups: int):
    """im2col via DMA instead of VPU shuffles: the 9 tap copies are
    strided rectangular VMEM->VMEM DMAs (hardware-native), so the dot
    reads a fully contiguous (m, 9*cpg) buffer and the only vector-unit
    work is the matmul itself."""
    tn, h, w, c = x_ref.shape
    cpg = c // groups
    opg = o_ref.shape[-1] // groups
    m = tn * h * w
    xp_ref[:] = jnp.zeros_like(xp_ref)
    xp_ref[:, 1:h + 1, 1:w + 1, :] = x_ref[:]
    wall = w_ref[:].reshape(9 * cpg, o_ref.shape[-1])
    for g in range(groups):
        copies = []
        for t, (dy, dx) in enumerate(TAPS):
            dma = pltpu.make_async_copy(
                xp_ref.at[:, dy:dy + h, dx:dx + w,
                          g * cpg:(g + 1) * cpg],
                cols_ref.at[:, :, :, t * cpg:(t + 1) * cpg],
                sems.at[t])
            dma.start()
            copies.append(dma)
        for dma in copies:
            dma.wait()
        y = jnp.dot(cols_ref[:].reshape(m, 9 * cpg),
                    wall[:, g * opg:(g + 1) * opg],
                    preferred_element_type=jnp.float32)
        y_ref[:] = y.astype(y_ref.dtype).reshape(tn, h, w, opg)
        out_dma = pltpu.make_async_copy(
            y_ref, o_ref.at[:, :, :, g * opg:(g + 1) * opg], sems.at[0])
        out_dma.start()
        out_dma.wait()


def _pallas_spatial_dma(x, w, *, groups: int, interpret: bool = False):
    n, h, wd, c = x.shape
    cpg = c // groups
    feats = w.shape[-1]
    tn = _pick_tile(n, h, wd, c, x.dtype.itemsize)
    m = tn * h * wd
    return pl.pallas_call(
        functools.partial(_spatial_kernel_dma, groups=groups),
        out_shape=jax.ShapeDtypeStruct((n, h, wd, feats), x.dtype),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, h, wd, c), lambda nb: (nb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cpg, feats), lambda nb: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, h, wd, feats), lambda nb: (nb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tn, h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((tn, h, wd, 9 * cpg), x.dtype),
            pltpu.VMEM((tn, h, wd, feats // groups), x.dtype),
            pltpu.SemaphoreType.DMA((9,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * feats * 9 * cpg,
            bytes_accessed=(x.size + w.size + n * h * wd * feats)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, w)


def _wgrad_kernel(x_ref, y_ref, o_ref, xp_ref, cols_ref, acc_ref, *,
                  groups: int):
    tn, h, w, c = x_ref.shape
    cpg = c // groups
    feats = y_ref.shape[-1]
    opg = feats // groups
    m = tn * h * w
    nb = pl.program_id(0)

    @pl.when(nb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xp_ref[:] = jnp.zeros_like(xp_ref)
    xp_ref[:, 1:h + 1, 1:w + 1, :] = x_ref[:]
    for g in range(groups):
        for t, (dy, dx) in enumerate(TAPS):
            cols_ref[:, t * cpg:(t + 1) * cpg] = (
                xp_ref[:, dy:dy + h, dx:dx + w, g * cpg:(g + 1) * cpg]
                .reshape(m, cpg))
        yg = y_ref[:, :, :, g * opg:(g + 1) * opg].reshape(m, opg)
        dw = lax.dot_general(cols_ref[:], yg, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        acc_ref[:, g * opg:(g + 1) * opg] += dw

    @pl.when(nb == pl.num_programs(0) - 1)
    def _():
        # acc rows are t*cpg + c with t = dy*3 + dx (TAPS order), columns
        # are g*opg + o — exactly the flattened HWIO layout
        o_ref[:] = acc_ref[:].astype(o_ref.dtype).reshape(3, 3, cpg, feats)


def _pallas_wgrad(x, ybar, *, groups: int, interpret: bool = False):
    n, h, wd, c = x.shape
    cpg = c // groups
    feats = ybar.shape[-1]
    opg = feats // groups
    tn = _pick_tile(n, h, wd, c, x.dtype.itemsize)
    m = tn * h * wd
    grid = (n // tn,)
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, groups=groups),
        out_shape=jax.ShapeDtypeStruct((3, 3, cpg, feats), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, h, wd, c), lambda nb: (nb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, h, wd, feats), lambda nb: (nb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, 3, cpg, feats), lambda nb: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tn, h + 2, wd + 2, c), x.dtype),
            pltpu.VMEM((m, 9 * cpg), x.dtype),
            pltpu.VMEM((9 * cpg, feats), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * wd * feats * 9 * cpg,
            bytes_accessed=(x.size + ybar.size + 9 * cpg * feats)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, ybar)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

gconv3x3_p = Primitive("mdd_gconv3x3")
gconv3x3_wgrad_p = Primitive("mdd_gconv3x3_wgrad")


def _spatial_abstract(x, w, *, groups):
    assert x.dtype == w.dtype, (x.dtype, w.dtype)
    assert x.shape[-1] == groups * w.shape[2], (x.shape, w.shape, groups)
    return jax.core.ShapedArray((*x.shape[:3], w.shape[-1]), x.dtype)


def _wgrad_abstract(x, ybar, *, groups):
    assert x.dtype == ybar.dtype
    return jax.core.ShapedArray(
        (3, 3, x.shape[-1] // groups, ybar.shape[-1]), x.dtype)


gconv3x3_p.def_abstract_eval(_spatial_abstract)
gconv3x3_wgrad_p.def_abstract_eval(_wgrad_abstract)


def _rot_swap(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """HWIO grouped kernel -> the kernel of the transposed (input-grad)
    conv: spatially rotated, per-group in/out channels swapped."""
    kh, kw, cpg, feats = w.shape
    opg = feats // groups
    w5 = w.reshape(kh, kw, cpg, groups, opg)
    w5 = w5[::-1, ::-1].transpose(0, 1, 4, 3, 2)          # -> (h,w,opg,g,cpg)
    return w5.reshape(kh, kw, opg, groups * cpg)


def gconv3x3(x: jnp.ndarray, w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Grouped 3x3 stride-1 SAME conv (NHWC x HWIO -> NHWC)."""
    if groups == 1:
        return _ref_spatial(x, w, groups=1)
    return gconv3x3_p.bind(x, w, groups=groups)


def gconv3x3_wgrad(x: jnp.ndarray, ybar: jnp.ndarray,
                   groups: int) -> jnp.ndarray:
    return gconv3x3_wgrad_p.bind(x, ybar, groups=groups)


# bilinear AD: JVPs re-bind the primitive on the tangent; transposes are
# the conjugate convs (dgrad = spatial conv with the rotated/swapped
# kernel; wgrad = its own primitive; and the wgrad's transposes fold
# back into spatial convs) — arbitrary-order differentiable.
ad.defbilinear(
    gconv3x3_p,
    lambda ybar, x, w, *, groups: gconv3x3_p.bind(
        ybar, _rot_swap(w, groups), groups=groups),
    lambda ybar, x, w, *, groups: gconv3x3_wgrad_p.bind(
        x, ybar, groups=groups),
)
ad.defbilinear(
    gconv3x3_wgrad_p,
    lambda dwbar, x, ybar, *, groups: gconv3x3_p.bind(
        ybar, _rot_swap(dwbar, groups), groups=groups),
    lambda dwbar, x, ybar, *, groups: gconv3x3_p.bind(
        x, dwbar, groups=groups),
)


def _batch_via_ref(ref_fn, args, dims, *, groups):
    x, other = args
    xd, od = dims
    xd = None if xd is batching.not_mapped else xd
    od = None if od is batching.not_mapped else od
    out = jax.vmap(functools.partial(ref_fn, groups=groups),
                   in_axes=(xd, od))(x, other)
    return out, 0


batching.primitive_batchers[gconv3x3_p] = functools.partial(
    _batch_via_ref, _ref_spatial)
batching.primitive_batchers[gconv3x3_wgrad_p] = functools.partial(
    _batch_via_ref, _ref_wgrad)

# lowerings: TPU -> pallas, everything else -> lax reference
mlir.register_lowering(
    gconv3x3_p, mlir.lower_fun(_pallas_spatial, multiple_results=False),
    platform="tpu")
mlir.register_lowering(
    gconv3x3_p, mlir.lower_fun(_ref_spatial, multiple_results=False))
mlir.register_lowering(
    gconv3x3_wgrad_p, mlir.lower_fun(_pallas_wgrad, multiple_results=False),
    platform="tpu")
mlir.register_lowering(
    gconv3x3_wgrad_p, mlir.lower_fun(_ref_wgrad, multiple_results=False))


def _apply_impl(prim, *args, **params):
    from jax._src import dispatch
    return dispatch.apply_primitive(prim, *args, **params)


gconv3x3_p.def_impl(functools.partial(_apply_impl, gconv3x3_p))
gconv3x3_wgrad_p.def_impl(functools.partial(_apply_impl, gconv3x3_wgrad_p))
