"""Differentiable Siamese Augmentation (DSA) — pure-JAX, on-device.

Replaces the reference's torch DiffAugment suite (``utils.py:362-539``):
``ParamDiffAug`` config, the strategy dispatcher (mode 'S' = one random
strategy per call, 'M' = all in sequence), and the differentiable ops —
scale/rotate (affine grid + bilinear sample), flip, brightness,
saturation, contrast, crop (pad+shift), cutout — with the reference's
``batchmode`` semantics (seeded call -> one transform shared by the whole
batch; unseeded -> per-sample transforms).

All ops are differentiable w.r.t. pixels and jit/vmap-friendly: explicit
PRNG keys thread the randomness (JAX-native replacement for the
``latestseed`` counter, ``utils.py:376-382``).  Layout NHWC.

NOTE (parity): the reference *declares* --dsa/--dsa_strategy but never
applies DiffAugment to synthetic batches in either distill loop
(SURVEY.md §2.5 row 26 — dead on the main path).  We expose the same
flags with the same default-off wiring, and the suite is fully functional
for users who enable it.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ParamDiffAug:
    """utils.py:362-373 defaults."""

    aug_mode: str = "S"
    prob_flip: float = 0.5
    ratio_scale: float = 1.2
    ratio_rotate: float = 15.0
    ratio_crop_pad: float = 0.125
    ratio_cutout: float = 0.5
    ratio_noise: float = 0.05
    brightness: float = 1.0
    saturation: float = 2.0
    contrast: float = 0.5


def _per_batch(key: jax.Array, batch_shared: bool, n: int, shape=()):
    """Uniform randoms, one per sample — or one broadcast value when the
    call is 'batchmode' (seeded; utils.py:387-391)."""
    if batch_shared:
        v = jax.random.uniform(key, (1, *shape))
        return jnp.broadcast_to(v, (n, *shape))
    return jax.random.uniform(key, (n, *shape))


def _affine_sample(x: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling on a normalized affine grid — torch
    ``affine_grid``+``grid_sample`` (align_corners=True) semantics.

    x: (N,H,W,C); theta: (N,2,3) mapping output coords -> input coords in
    [-1,1] normalized space.  Out-of-bounds samples are zero (border pad).
    """
    n, h, w, c = x.shape
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")           # (H,W)
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1)            # (H,W,3)
    src = jnp.einsum("nij,hwj->nhwi", theta, coords)       # (N,H,W,2) x,y

    # to pixel space (align_corners=True: -1 -> 0, 1 -> size-1)
    px = (src[..., 0] + 1.0) * (w - 1) / 2.0
    py = (src[..., 1] + 1.0) * (h - 1) / 2.0

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def gather(yi, xi):
        valid = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        batch = jnp.arange(n)[:, None, None]
        vals = x[batch, yc, xc]                            # (N,H,W,C)
        return vals * valid[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return ((1 - wy) * ((1 - wx) * v00 + wx * v01)
            + wy * ((1 - wx) * v10 + wx * v11))


def rand_scale(x, key, p: ParamDiffAug, batch_shared: bool):
    """utils.py:413-429: sx,sy ~ U[1/r, r]; theta=diag(sx,sy)."""
    n = x.shape[0]
    r = p.ratio_scale
    k1, k2 = jax.random.split(key)
    sx = _per_batch(k1, batch_shared, n) * (r - 1.0 / r) + 1.0 / r
    sy = _per_batch(k2, batch_shared, n) * (r - 1.0 / r) + 1.0 / r
    zeros = jnp.zeros(n)
    theta = jnp.stack([
        jnp.stack([sx, zeros, zeros], -1),
        jnp.stack([zeros, sy, zeros], -1)], 1)
    return _affine_sample(x, theta)


def rand_rotate(x, key, p: ParamDiffAug, batch_shared: bool):
    """utils.py:432-443: angle ~ U[-r,r] degrees."""
    n = x.shape[0]
    ang = ((_per_batch(key, batch_shared, n) - 0.5) * 2
           * p.ratio_rotate / 180.0 * jnp.pi)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    zeros = jnp.zeros(n)
    theta = jnp.stack([
        jnp.stack([cos, -sin, zeros], -1),
        jnp.stack([sin, cos, zeros], -1)], 1)
    return _affine_sample(x, theta)


def rand_flip(x, key, p: ParamDiffAug, batch_shared: bool):
    n = x.shape[0]
    r = _per_batch(key, batch_shared, n)[:, None, None, None]
    return jnp.where(r < p.prob_flip, x[:, :, ::-1, :], x)


def rand_brightness(x, key, p: ParamDiffAug, batch_shared: bool):
    n = x.shape[0]
    r = _per_batch(key, batch_shared, n)[:, None, None, None]
    return x + (r - 0.5) * p.brightness


def rand_saturation(x, key, p: ParamDiffAug, batch_shared: bool):
    n = x.shape[0]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    r = _per_batch(key, batch_shared, n)[:, None, None, None]
    return (x - mean) * (r * p.saturation) + mean


def rand_contrast(x, key, p: ParamDiffAug, batch_shared: bool):
    n = x.shape[0]
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    r = _per_batch(key, batch_shared, n)[:, None, None, None]
    return (x - mean) * (r + p.contrast) + mean


def rand_crop(x, key, p: ParamDiffAug, batch_shared: bool):
    """utils.py:489-508: pad-by-1 then integer shift up to ratio*size."""
    n, h, w, c = x.shape
    sh = int(h * p.ratio_crop_pad + 0.5)
    sw = int(w * p.ratio_crop_pad + 0.5)
    k1, k2 = jax.random.split(key)
    ty = jnp.floor(_per_batch(k1, batch_shared, n) * (2 * sh + 1)).astype(jnp.int32) - sh
    tx = jnp.floor(_per_batch(k2, batch_shared, n) * (2 * sw + 1)).astype(jnp.int32) - sw
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gy = jnp.clip(jnp.arange(h)[None, :, None] + ty[:, None, None] + 1, 0, h + 1)
    gx = jnp.clip(jnp.arange(w)[None, None, :] + tx[:, None, None] + 1, 0, w + 1)
    batch = jnp.arange(n)[:, None, None]
    return xp[batch, gy, gx]


def rand_cutout(x, key, p: ParamDiffAug, batch_shared: bool):
    """utils.py:511-531: zero a ratio-sized box at random offset."""
    n, h, w, c = x.shape
    ch_ = int(h * p.ratio_cutout + 0.5)
    cw = int(w * p.ratio_cutout + 0.5)
    k1, k2 = jax.random.split(key)
    oy = jnp.floor(_per_batch(k1, batch_shared, n)
                   * (h + (1 - ch_ % 2))).astype(jnp.int32)
    ox = jnp.floor(_per_batch(k2, batch_shared, n)
                   * (w + (1 - cw % 2))).astype(jnp.int32)
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    y0 = jnp.clip(oy - ch_ // 2, 0, h)[:, None, None]
    y1 = jnp.clip(oy - ch_ // 2 + ch_, 0, h)[:, None, None]
    x0 = jnp.clip(ox - cw // 2, 0, w)[:, None, None]
    x1 = jnp.clip(ox - cw // 2 + cw, 0, w)[:, None, None]
    mask = 1.0 - ((ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)).astype(x.dtype)
    return x * mask[..., None]


AUGMENT_FNS: Dict[str, Sequence[Callable]] = {
    "color": (rand_brightness, rand_saturation, rand_contrast),
    "crop": (rand_crop,),
    "cutout": (rand_cutout,),
    "flip": (rand_flip,),
    "scale": (rand_scale,),
    "rotate": (rand_rotate,),
}


def diff_augment(x: jnp.ndarray, strategy: str, key: jax.Array,
                 param: Optional[ParamDiffAug] = None,
                 batch_shared: bool = False) -> jnp.ndarray:
    """DiffAugment dispatcher (utils.py:384-409).

    strategy: underscore-joined op names; mode 'S' picks ONE op family at
    random per call, mode 'M' applies all in sequence.  ``batch_shared``
    is the reference's seeded "batchmode" (Siamese: same transform for the
    whole batch).
    """
    param = param or ParamDiffAug()
    if not strategy or strategy.lower() == "none":
        return x
    names = strategy.split("_")
    if param.aug_mode == "M":
        for name in names:
            for fn in AUGMENT_FNS[name]:
                key, sub = jax.random.split(key)
                x = fn(x, sub, param, batch_shared)
        return x
    if param.aug_mode == "S":
        key, pick_key = jax.random.split(key)
        pick = jax.random.randint(pick_key, (), 0, len(names))
        branches = []
        for name in names:
            def make_branch(ops):
                def branch(args):
                    xb, kb = args
                    for fn in ops:
                        kb, sub = jax.random.split(kb)
                        xb = fn(xb, sub, param, batch_shared)
                    return xb
                return branch
            branches.append(make_branch(AUGMENT_FNS[name]))
        return jax.lax.switch(pick, branches, (x, key))
    raise ValueError(f"unknown aug_mode: {param.aug_mode}")


# reference-name alias
DiffAugment = diff_augment
