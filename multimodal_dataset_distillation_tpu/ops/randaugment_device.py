"""On-device RandAugment: the full 10-op VL suite in pure JAX.

Completes the "decode/resize/RandAugment on device" pipeline (the C++
fastimage pool covers decode+crop+resize; this covers the augment tail).
Op semantics and level->argument mappings follow the reference's
``transform/randaugment.py:208-265`` via our PIL-parity host version
(``ops/randaugment.py``): enhance factor = level/10*1.8+0.1, shear =
level/10*0.3 (random sign), translate = level/10*10 px (random sign),
rotate = level/10*30 deg (random sign), solarize threshold = level/10*256,
posterize bits = max(level/10*4, 1), fill = 128.

Images are float32 **[0, 255]** NHWC (pre-normalization, like PIL uint8).
Everything is jittable/vmappable: histogram ops use one-hot bincounts on
the VPU, geometric ops ride the shared bilinear resampler from
:mod:`~.diffaug`.  Sampling (``random_augment_device``) mirrors
``RandomAugment.__call__``: N ops sampled with replacement, each applied
with prob 0.5, dispatched with ``lax.switch`` per image.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

MAX_LEVEL = 10
FILL = 128.0


# ---------------------------------------------------------------------------
# photometric ops (single image, HWC float [0,255])
# ---------------------------------------------------------------------------

def identity(img, level, key):
    return img


def autocontrast(img, level, key):
    """Per-channel min/max rescale (ImageOps.autocontrast, cutoff=0)."""
    lo = jnp.min(img, axis=(0, 1), keepdims=True)
    hi = jnp.max(img, axis=(0, 1), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, out, img)


def equalize(img, level, key):
    """Per-channel histogram equalization (ImageOps.equalize semantics:
    LUT built from the cumulative histogram with PIL's step rule)."""
    def eq_channel(c):
        q = jnp.clip(c, 0, 255).astype(jnp.int32).reshape(-1)
        hist = jnp.zeros(256, jnp.int32).at[q].add(1)
        # PIL: step = (total - last_nonzero_bin) // 255
        nonzero = hist > 0
        last_val = hist[jnp.argmax(jnp.where(
            nonzero, jnp.arange(256), -1))]
        step = (jnp.sum(hist) - last_val) // 255
        cum = jnp.cumsum(hist) - hist  # exclusive prefix sum
        lut = (cum + step // 2) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255)
        out = lut[q].reshape(c.shape).astype(c.dtype)
        return jnp.where(step > 0, out, c)

    return jnp.stack([eq_channel(img[..., k])
                      for k in range(img.shape[-1])], axis=-1)


def solarize(img, level, key):
    thresh = (level / MAX_LEVEL) * 256.0
    return jnp.where(img >= thresh, 255.0 - img, img)


def posterize(img, level, key):
    bits = jnp.maximum((level / MAX_LEVEL) * 4.0, 1.0).astype(jnp.int32)
    shift = 8 - bits
    q = jnp.clip(img, 0, 255).astype(jnp.int32)
    return ((q >> shift) << shift).astype(img.dtype)


def _blend(a, b, factor):
    return jnp.clip(b + (a - b) * factor, 0, 255)


def color(img, level, key):
    factor = (level / MAX_LEVEL) * 1.8 + 0.1
    gray = jnp.mean(img, axis=-1, keepdims=True) * jnp.ones_like(img)
    return _blend(img, gray, factor)


def contrast(img, level, key):
    factor = (level / MAX_LEVEL) * 1.8 + 0.1
    # PIL Contrast: blend with the mean of the L-mode image
    l = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    mean = jnp.mean(jnp.floor(l + 0.5))
    return _blend(img, jnp.full_like(img, mean), factor)


def brightness(img, level, key):
    factor = (level / MAX_LEVEL) * 1.8 + 0.1
    return _blend(img, jnp.zeros_like(img), factor)


def sharpness(img, level, key):
    """PIL Sharpness: blend with a 3x3 smoothing-kernel filtered image
    (kernel [[1,1,1],[1,5,1],[1,1,1]]/13, edges kept from the original)."""
    factor = (level / MAX_LEVEL) * 1.8 + 0.1
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    x = img.transpose(2, 0, 1)[:, None]  # C,1,H,W
    sm = jax.lax.conv_general_dilated(
        x, k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0].transpose(1, 2, 0)
    h, w = img.shape[0], img.shape[1]
    ii = jnp.arange(h)[:, None]
    jj = jnp.arange(w)[None, :]
    interior = ((ii > 0) & (ii < h - 1) & (jj > 0) & (jj < w - 1))[..., None]
    smoothed = jnp.where(interior, sm, img)
    return _blend(img, smoothed, factor)


# ---------------------------------------------------------------------------
# geometric ops: affine resample with fill=128 (single image)
# ---------------------------------------------------------------------------

def _affine(img, mat, fill=FILL):
    """Bilinear sample of ``img`` at coordinates mat @ [x_out, y_out, 1]
    (normalized [-1,1] coords); out-of-range -> fill."""
    h, w, c = img.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1) @ mat.T  # (h, w, 2)
    sx = (coords[..., 0] + 1.0) * (w - 1) / 2.0
    sy = (coords[..., 1] + 1.0) * (h - 1) / 2.0
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yy, xx):
        inside = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]
        return jnp.where(inside[..., None], vals, fill)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
            + (v10 * (1 - wx) + v11 * wx) * wy)


def _signed(key, mag):
    return jnp.where(jax.random.bernoulli(key), -mag, mag)


def rotate(img, level, key):
    deg = _signed(key, (level / MAX_LEVEL) * 30.0)
    th = jnp.deg2rad(deg)
    mat = jnp.array([[jnp.cos(th), -jnp.sin(th), 0.0],
                     [jnp.sin(th), jnp.cos(th), 0.0]])
    return _affine(img, mat)


def shear_x(img, level, key):
    s = _signed(key, (level / MAX_LEVEL) * 0.3)
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    mat = mat.at[0, 1].set(s)
    return _affine(img, mat)


def shear_y(img, level, key):
    s = _signed(key, (level / MAX_LEVEL) * 0.3)
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    mat = mat.at[1, 0].set(s)
    return _affine(img, mat)


def translate_x(img, level, key):
    px = _signed(key, (level / MAX_LEVEL) * 10.0)
    w = img.shape[1]
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    mat = mat.at[0, 2].set(2.0 * px / jnp.maximum(w - 1, 1))
    return _affine(img, mat)


def translate_y(img, level, key):
    px = _signed(key, (level / MAX_LEVEL) * 10.0)
    h = img.shape[0]
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    mat = mat.at[1, 2].set(2.0 * px / jnp.maximum(h - 1, 1))
    return _affine(img, mat)


# the reference train pipeline's 10-op list (data/__init__.py:200-203)
VL_DEVICE_OPS = (identity, autocontrast, equalize, brightness, sharpness,
                 shear_x, shear_y, translate_x, translate_y, rotate)


@functools.partial(jax.jit, static_argnames=("n", "m"))
def random_augment_device(images: jnp.ndarray, key: jax.Array,
                          n: int = 2, m: int = 5) -> jnp.ndarray:
    """Batched RandomAugment(N, M): per image, sample N ops with
    replacement, each applied with prob 0.5 (RandomAugment.__call__).

    images: (B, H, W, C) float32 in [0, 255]; returns same.
    """
    n_ops = len(VL_DEVICE_OPS)

    def one(img, key):
        def body(img, k):
            kop, kp, kparam = jax.random.split(k, 3)
            op_idx = jax.random.randint(kop, (), 0, n_ops)
            apply = jax.random.bernoulli(kp, 0.5)
            out = jax.lax.switch(
                op_idx,
                [functools.partial(lambda f, x, kk: f(x, float(m), kk), f)
                 for f in VL_DEVICE_OPS],
                img, kparam)
            return jnp.where(apply, out, img), None

        keys = jax.random.split(key, n)
        img, _ = jax.lax.scan(body, img, keys)
        return img

    keys = jax.random.split(key, images.shape[0])
    return jax.vmap(one)(images, keys)
