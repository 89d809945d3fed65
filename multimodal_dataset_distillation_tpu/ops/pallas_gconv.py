"""Pallas TPU kernels for NFNet's grouped 3x3 convolutions.

Why this exists (round-3 perf campaign, DESIGN.md §10.1): the grouped
3x3 convs of NFNet-L0's stage-2/3/4 bottlenecks (``models/nfnet.py``
conv2/conv2b, group width 64 — the reference builds them with timm's
grouped Conv2d via ``/root/reference/networks.py:666``) profile as the
distill step's least-efficient conv class, and the only way to know
whether XLA's rank-5 grouped lowering is beatable was to build the best
structural alternative and measure it.  **Measured outcome: parity,
not a win** (0.75-1.08x of XLA standalone, ``tools/bench_gconv.py``;
XLA's in-step fused kernels are faster still) — the 2x block-diagonal
FLOP redundancy this kernel pays to feed the MXU full 128-lane work
cancels exactly the granularity gain it was chasing, i.e. the grouped
conv class is at its hardware-structure ceiling.  The kernel therefore
ships **default-off** (``--pallas_gconv``) as the measured record, and
the module doubles as the template for pallas conv work: a JAX
primitive that is correct under every AD composition the framework
uses, with the kernel-engineering pitfalls documented below.

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

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.interpreters import ad, batching, mlir

try:  # modern public location
    from jax.extend.core import Primitive
except ImportError:  # pragma: no cover - older jax
    from jax.core import Primitive

# trace-time switch: models read this when building the conv (WSConv in
# models/layers.py).  The CLIs call set_enabled(cfg.pallas_gconv);
# MDD_PALLAS_GCONV=0/1 overrides either way.  Enabling is semantically
# safe on every platform (non-TPU lowers to the lax reference) — the
# switch only exists so the XLA-native path stays one flag away, and
# because a >1-device GSPMD mesh cannot partition the pallas call (the
# CLIs force it off there; single-chip TPU is the bench/production
# target this kernel serves).
_ENABLED = False
_FORCED_OFF = False


def set_enabled(on: bool) -> None:
    """Manual override — also clears any configure()-set force-off (the
    caller takes responsibility for the device context; tests and
    bench.py use this on single-chip setups after a CLI may have
    configured for a multi-device one in the same process)."""
    global _ENABLED, _FORCED_OFF
    _ENABLED = bool(on)
    _FORCED_OFF = False


def configure(cfg) -> None:
    """CLI entry hook: apply cfg.pallas_gconv, and HARD-disable on any
    >1-device run — the force-off wins over the env override too, since
    a partitioned pallas call is a compile error, not a preference."""
    import math

    import jax
    global _FORCED_OFF
    multi_dev = len(jax.devices()) > 1 or (
        cfg.mesh_shape and math.prod(cfg.mesh_shape) > 1)
    set_enabled(cfg.pallas_gconv and not multi_dev)
    _FORCED_OFF = bool(multi_dev)


def enabled() -> bool:
    from multimodal_dataset_distillation_tpu.utils.env import env_bool

    if _FORCED_OFF:
        return False
    env = env_bool("MDD_PALLAS_GCONV")
    if env is not None:
        return env
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
# pallas kernels (v3: group-pair packing)
#
# Kernel-engineering record (measured on v5e-1, tools/bench_gconv.py):
# v1 (per-group im2col built with strided VPU slice+reshape writes) ran
# 4-7x SLOWER than XLA's grouped lowering — Mosaic lowers the
# misaligned (tn,h,w)-merge reshapes of sublane-sliced windows to
# scalarized shuffles.  v2 (im2col via VMEM->VMEM DMA) fails to compile:
# DMA slices must be 8-sublane aligned, and conv taps are offset by
# 0/1/2.  v3 avoids misaligned structure entirely:
#   * two adjacent 64-channel groups are packed into one 128-lane block
#     ("pair"); every lane slice in the kernel is 128-aligned;
#   * the 3 dy-shifts are lane-CONCATENATED into rows3[tn,h,w+2,3*128]
#     (dy is a major dim -> free slicing; concat at 128 lanes);
#   * ONE dot per pair against a block-diagonal packed weight
#     [3*128, 3*128] computes all taps/channels at once (K=N=384: full
#     MXU depth and lanes; the off-diagonal zero blocks cost 2x FLOPs,
#     which sits far below the bytes bound);
#   * the dx-shifts resolve as 3 value-level sublane slice-adds of the
#     dot result (no ref stores, no reshape-after-slice).
# wgrad uses the same rows3 against a zero-padded lane-concat of ybar:
# a single [384, m] x [m, 384] dot yields ALL 9 taps per pair; the
# same-group diagonal blocks are extracted outside the kernel.
# ---------------------------------------------------------------------------

_LANES = 128
_CPG = 64  # group width this fast path packs (NFNet group_size=64)


def _supported(groups: int, cpg: int, opg: int) -> bool:
    return groups % 2 == 0 and cpg == _CPG and opg == _CPG


def _pick_tile(n: int, h: int, w: int, itemsize: int) -> int:
    """Largest divisor of n keeping the pair-kernel VMEM ~<8 MB."""
    best = 1
    for tn in range(1, n + 1):
        if n % tn:
            continue
        m2 = tn * h * (w + 2)
        vmem = (tn * (h + 2) * (w + 2) * _LANES * itemsize   # xp value
                + 2 * m2 * 3 * _LANES * itemsize             # rows3/ypad3
                + m2 * 3 * _LANES * 4                        # dot out f32
                + 4 * tn * h * w * _LANES * itemsize)        # dbl-buf io
        if vmem < 8 * 2**20:
            best = tn
    return best


def _pack_w_pairs(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """HWIO grouped kernel -> per-pair block-diagonal [P, 384, 384]:
    out[p, dy*128 + s*64 + c, dx*128 + t*64 + o] =
        (s == t) * w[dy, dx, c, (2p+s)*64 + o]."""
    p = groups // 2
    w6 = w.reshape(3, 3, _CPG, p, 2, _CPG)         # dy,dx,c,p,s,o
    eye = jnp.eye(2, dtype=w.dtype)
    wc = jnp.einsum("yxcpso,st->pyscxto", w6, eye)
    return wc.reshape(p, 3 * _LANES, 3 * _LANES)


def _spatial_kernel(x_ref, w_ref, o_ref):
    tn, h, w, _ = x_ref.shape
    m2 = tn * h * (w + 2)
    xp = jnp.pad(x_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows3 = jnp.concatenate([xp[:, dy:dy + h, :, :] for dy in range(3)],
                            axis=-1)
    t = jnp.dot(rows3.reshape(m2, 3 * _LANES), w_ref[0],
                preferred_element_type=jnp.float32)
    t5 = t.reshape(tn, h, w + 2, 3 * _LANES)
    acc = (t5[:, :, 0:w, 0 * _LANES:1 * _LANES]
           + t5[:, :, 1:w + 1, 1 * _LANES:2 * _LANES]
           + t5[:, :, 2:w + 2, 2 * _LANES:3 * _LANES])
    o_ref[:] = acc.astype(o_ref.dtype)


def _pallas_spatial(x, w, *, groups: int, interpret: bool = False):
    n, h, wd, c = x.shape
    cpg = c // groups
    feats = w.shape[-1]
    if not _supported(groups, cpg, feats // groups):
        return _ref_spatial(x, w, groups=groups)
    pairs = groups // 2
    wc = _pack_w_pairs(w, groups)
    tn = _pick_tile(n, h, wd, x.dtype.itemsize)
    return pl.pallas_call(
        _spatial_kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, wd, feats), x.dtype),
        grid=(pairs, n // tn),
        in_specs=[
            pl.BlockSpec((tn, h, wd, _LANES), lambda pg, nb: (nb, 0, 0, pg),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * _LANES, 3 * _LANES),
                         lambda pg, nb: (pg, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, h, wd, _LANES),
                               lambda pg, nb: (nb, 0, 0, pg),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * (wd + 2) * pairs * (3 * _LANES) ** 2,
            bytes_accessed=(x.size + wc.size + n * h * wd * feats)
            * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, wc)


def _wgrad_kernel(x_ref, y_ref, o_ref, acc_ref):
    tn, h, w, _ = x_ref.shape
    m2 = tn * h * (w + 2)
    nb = pl.program_id(1)

    @pl.when(nb == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xp = jnp.pad(x_ref[:], ((0, 0), (1, 1), (1, 1), (0, 0)))
    rows3 = jnp.concatenate([xp[:, dy:dy + h, :, :] for dy in range(3)],
                            axis=-1)
    ypad3 = jnp.concatenate(
        [jnp.pad(y_ref[:], ((0, 0), (0, 0), (dx, 2 - dx), (0, 0)))
         for dx in range(3)], axis=-1)
    dw = lax.dot_general(rows3.reshape(m2, 3 * _LANES),
                         ypad3.reshape(m2, 3 * _LANES),
                         (((0,), (0,)), ((), ())),
                         preferred_element_type=jnp.float32)
    acc_ref[:] += dw

    @pl.when(nb == pl.num_programs(1) - 1)
    def _():
        o_ref[0] = acc_ref[:]


def _pallas_wgrad(x, ybar, *, groups: int, interpret: bool = False):
    n, h, wd, c = x.shape
    cpg = c // groups
    feats = ybar.shape[-1]
    if not _supported(groups, cpg, feats // groups):
        return _ref_wgrad(x, ybar, groups=groups)
    pairs = groups // 2
    tn = _pick_tile(n, h, wd, x.dtype.itemsize)
    raw = pl.pallas_call(
        _wgrad_kernel,
        out_shape=jax.ShapeDtypeStruct((pairs, 3 * _LANES, 3 * _LANES),
                                       jnp.float32),
        grid=(pairs, n // tn),
        in_specs=[
            pl.BlockSpec((tn, h, wd, _LANES), lambda pg, nb: (nb, 0, 0, pg),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, h, wd, _LANES), lambda pg, nb: (nb, 0, 0, pg),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3 * _LANES, 3 * _LANES),
                               lambda pg, nb: (pg, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3 * _LANES, 3 * _LANES), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * (wd + 2) * pairs * (3 * _LANES) ** 2,
            bytes_accessed=(x.size + ybar.size) * x.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(x, ybar)
    # extract the same-group (s == t) diagonal blocks:
    # raw[p, dy*128+s*64+c, dx*128+t*64+o] -> dw[dy,dx,c,(2p+s)*64+o]
    r7 = raw.reshape(pairs, 3, 2, _CPG, 3, 2, _CPG)
    eye = jnp.eye(2, dtype=raw.dtype)
    dw = jnp.einsum("pyscxto,st->yxcpso", r7, eye)
    return dw.reshape(3, 3, _CPG, feats).astype(x.dtype)


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
