"""Space-to-depth stem rewrite (exact-math layout transform).

Why this exists (TPU layout economics): the NFNet ``deep_quad`` stem
(reference builds it via timm ``nfnet_l0``, ``networks.py:666``) runs
3x3 convs at 112x112 with 16/32/64 channels.  Channels that narrow make
XLA:TPU choose *batch-minor* layouts, so the mb=100 distillation batch
pads to 128 lanes — 22% of every stem byte is padding, and the stem
class profiles at only 52-73% of its roofline floor (DESIGN.md §10.1).

The fix is the classic MLPerf-ResNet trick, generalized: re-express the
whole stem in space-to-depth coordinates.  Images enter as
``s2d(x, 4)`` — (N, H/4, W/4, 48) — and every stem conv becomes an
equivalent conv on the block grid whose channel counts are 4x/16x
larger (48 -> 64 -> 128 -> 256 -> 128 for NFNet-L0), so XLA packs
channels into lanes with zero batch padding.  The transform is
*mathematically exact* (same sums, float-level identical up to
reassociation): the original standardized kernel is rearranged —
never re-parameterized — so the parameter tree, checkpoints, expert
buffers, and torch-import paths are untouched.

Derivation.  Original conv: kernel k (odd), stride s, TF-SAME padding
(lo = total//2 — matches ``lax`` SAME and the torch mirror's
``_tf_same_pad``), input grid H with C channels stored as s2d(fi)
blocks, output grid H/s stored as s2d(fo) blocks, with ``fi = s*fo`` so
both live on the same block grid of H/fi positions.  For output phase
``e`` and tap ``i``, the input row is ``r = s*(fo*P + e) + i - pl``
(``pl`` = SAME lo-pad), i.e. block ``P + u`` at intra-block offset
``di`` where ``(u, di) = divmod(s*e + i - pl, fi)``.  Collecting all
(e, i) gives a block-space kernel of size ``K = u_max - u_min + 1``
with explicit block padding ``(-u_min, u_max)``; each (phase, tap)
lands in exactly one (u, di) slot, so the rearranged kernel
``W2[K, K, fi*fi*Cin, fo*fo*Cout]`` is a zero-padded scatter of the
original ``w[k, k, Cin, Cout]`` — built here with 4 static pads + one
stack (no gather/scatter ops), cheap enough to run inside the
distillation inner loop every step.

FLOP cost: the zero slots are real MACs once packed densely
(stride-1 convs become block-3x3 over 4x channels = 4x FLOPs), but the
stem is ~1 GFLOP/image against a 14 GFLOP forward — bandwidth, not
FLOPs, is what the stem pays for (see the measured A/B in DESIGN.md).

Gate: module-level, mirroring ``ops/pallas_gconv`` — set from the CLI
(``--stem_s2d``) or ``bench.py`` (``BENCH_STEM_S2D``); read by the
NFNet stem at trace time.  Anything that flips the gate must build a
fresh jitted function (jit does not key on globals).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from multimodal_dataset_distillation_tpu.utils.env import env_bool

_ENABLED = bool(env_bool("MDD_STEM_S2D"))


def set_enabled(on: bool) -> None:
    global _ENABLED
    _ENABLED = bool(on)


def configure(cfg) -> None:
    """CLI wiring: cfg.stem_s2d, with MDD_STEM_S2D winning when set.

    The env override exists for A/B runs (config.py documents it); like
    ``ops/pallas_gconv`` it must survive the CLIs' configure(cfg) call,
    otherwise ``MDD_STEM_S2D=1 python distill.py`` would silently
    measure the plain stem (cfg.stem_s2d defaults False).
    """
    from multimodal_dataset_distillation_tpu.utils.env import env_bool

    env = env_bool("MDD_STEM_S2D")
    if env is not None:
        set_enabled(env)
    else:
        set_enabled(bool(getattr(cfg, "stem_s2d", False)))


def enabled() -> bool:
    return _ENABLED


def space_to_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """NHWC -> (N, H/f, W/f, f*f*C); channel order c' = (di*f + dj)*C + c."""
    n, h, w, c = x.shape
    assert h % f == 0 and w % f == 0, (h, w, f)
    x = x.reshape(n, h // f, f, w // f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // f, w // f, f * f * c)


def depth_to_space(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth` (same phase-major channel order)."""
    n, a, b, cc = x.shape
    c = cc // (f * f)
    x = x.reshape(n, a, b, f, f, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, a * f, b * f, c)


def block_geometry(k: int, stride: int, fi: int, fo: int) -> Tuple[int, int, int]:
    """(K, u_min, u_max) of the block-space kernel for an original
    (k, stride, TF-SAME) conv with s2d(fi) input and s2d(fo) output."""
    assert k % 2 == 1, "odd kernels only"
    assert fi == stride * fo, (fi, stride, fo)
    # TF-SAME lo pad for stride-divisible inputs: total = k - stride
    # (out = H/s exactly), lo = total // 2.
    pl = max(k - stride, 0) // 2
    offs = [stride * e + i - pl for e in range(fo) for i in range(k)]
    u_min = min(o // fi for o in offs)
    u_max = max(o // fi for o in offs)
    return u_max - u_min + 1, u_min, u_max


def rearrange_kernel(w: jnp.ndarray, stride: int, fi: int, fo: int) -> jnp.ndarray:
    """Rearrange an original HWIO kernel into its block-space equivalent.

    Returns W2 of shape (K, K, fi*fi*Cin, fo*fo*Cout).  Built as fo*fo
    static zero-pads of ``w`` stacked into the output-channel dim — a
    pure layout op under autodiff (its transpose is a slice+sum), so the
    distillation meta-gradient flows through it exactly.
    """
    k = w.shape[0]
    assert w.shape[1] == k, "square kernels only"
    cin, cout = w.shape[2], w.shape[3]
    K, u_min, _ = block_geometry(k, stride, fi, fo)
    pl = max(k - stride, 0) // 2
    span = K * fi
    phases = []
    for e in range(fo):
        a_e = stride * e - pl - fi * u_min  # row slot of tap i=0
        for f in range(fo):
            a_f = stride * f - pl - fi * u_min
            wef = jnp.pad(w, ((a_e, span - k - a_e),
                              (a_f, span - k - a_f), (0, 0), (0, 0)))
            # (K, fi, K, fi, Cin, Cout) -> (K, K, fi, fi, Cin, Cout)
            wef = wef.reshape(K, fi, K, fi, cin, cout)
            wef = wef.transpose(0, 2, 1, 3, 4, 5)
            phases.append(wef.reshape(K, K, fi * fi * cin, cout))
    w2 = jnp.stack(phases, axis=-2)  # (K, K, fi*fi*Cin, fo*fo, Cout)
    return w2.reshape(K, K, fi * fi * cin, fo * fo * cout)


def block_padding(k: int, stride: int, fi: int, fo: int) -> Tuple[int, int]:
    """Explicit block-space padding replicating the original TF-SAME."""
    _, u_min, u_max = block_geometry(k, stride, fi, fo)
    return (-u_min, u_max)
