#!/usr/bin/env python
"""A/B: pallas grouped-conv kernels vs XLA's native grouped lowering.

Measures the three AD roles (fwd, dgrad, wgrad) at the NFNet-L0 shapes
that appear in the headline distill step (DESIGN.md §10.1).  Uses the
scan-over-rotating-inputs harness from tools/conv_micro.py (no
loop-invariant operands, full-output accumulation, host-materialization
sync).

Run on TPU:  python tools/bench_gconv.py
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, N, H/W, C, groups)
SHAPES = [
    ("stage2 28x28 c128 g2", 100, 28, 128, 2),
    ("stage3 14x14 c384 g6", 100, 14, 384, 6),
    ("stage4 7x7 c384 g6", 100, 7, 384, 6),
]


def bench(fn, xs, w, out_shape, iters=300):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(xs, w):
        def body(c, i):
            xi = jax.lax.dynamic_index_in_dim(xs, i, keepdims=False)
            return c + fn(xi, w), jnp.bfloat16(0.0)
        acc, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.bfloat16),
                              jnp.arange(iters) % xs.shape[0])
        return jnp.sum(acc)

    float(run(xs, w))
    t0 = time.perf_counter()
    float(run(xs, w))
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.ops import pallas_gconv as pg

    rows = {}
    print(f"{'case':26} {'role':6} {'xla ms':>7} {'pallas ms':>9} {'x':>5}")
    for name, n, hw, c, g in SHAPES:
        cpg = c // g
        rs = np.random.RandomState(0)
        xs = jnp.asarray(rs.randn(4, n, hw, hw, c), jnp.bfloat16)
        w = jnp.asarray(rs.randn(3, 3, cpg, c) * 0.05, jnp.bfloat16)
        ys = jnp.asarray(rs.randn(4, n, hw, hw, c), jnp.bfloat16)

        cases = {
            # fwd also stands in for dgrad (same kernel, transformed w)
            "fwd": (functools.partial(pg._ref_spatial, groups=g),
                    functools.partial(pg._pallas_spatial, groups=g),
                    w, (n, hw, hw, c)),
            # wgrad signature is (x, ybar): scan rotates x, fixed ybar
            "wgrad": (functools.partial(pg._ref_wgrad, groups=g),
                      functools.partial(pg._pallas_wgrad, groups=g),
                      ys[0], (3, 3, cpg, c)),
        }
        for role, (xla_fn, pal_fn, second, out_shape) in cases.items():
            dt_x = bench(xla_fn, xs, second, out_shape)
            dt_p = bench(pal_fn, xs, second, out_shape)
            rows[f"{name}/{role}"] = {
                "xla_ms": round(dt_x * 1e3, 3),
                "pallas_ms": round(dt_p * 1e3, 3),
                "speedup": round(dt_x / dt_p, 2)}
            print(f"{name:26} {role:6} {dt_x*1e3:7.3f} {dt_p*1e3:9.3f} "
                  f"{dt_x/dt_p:5.2f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
