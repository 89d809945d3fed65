#!/usr/bin/env python
"""Standalone micro-benchmark of the distill step's conv classes.

Answers ONE question (round-3 perf campaign): is the in-step conv
bandwidth (tools/conv_map.py: 260-773 GB/s depending on class) XLA's
kernel ceiling for those shapes, or interference from the surrounding
step (spills, fusion choices)?  Each representative conv signature from
the profiled headline step runs alone on the chip in a fori_loop whose
weight depends on the previous iteration's output (a *1e-30 scalar
perturbation — defeats CSE/hoisting, costs nothing), so iterations
serialize without host syncs.

Achieved GB/s is computed from ALGORITHMIC bytes (in + weight + out,
unpadded), the same convention as conv_map's per-signature table — so
a standalone number close to the in-step number means XLA's emitted
kernel is the ceiling, and beating it needs a better kernel (Pallas),
not scheduling.

Run on TPU:  python tools/conv_micro.py            (~2 min, cached)
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, in_shape NHWC, kernel HWIO, strides, feature_groups,
#  in-step GB/s from conv_map on the headline profile)
CASES = [
    ("1x1 14x14 1536->384", (100, 14, 14, 1536), (1, 1, 1536, 384), 1, 1, 710),
    ("1x1 14x14 384->1536", (100, 14, 14, 384), (1, 1, 384, 1536), 1, 1, 720),
    ("grp6 3x3 14x14 384", (100, 14, 14, 384), (3, 3, 64, 384), 1, 6, 450),
    ("grp2 3x3 28x28 128", (100, 28, 28, 128), (3, 3, 64, 128), 1, 2, 500),
    ("stem 3x3 112x112 32->64", (100, 112, 112, 32), (3, 3, 32, 64), 1, 1, 450),
    ("stem 3x3 112x112 64->64", (100, 112, 112, 64), (3, 3, 64, 64), 1, 1, 510),
    ("3x3 56x56 64->64", (100, 56, 56, 64), (3, 3, 64, 64), 1, 1, 491),
    ("1x1 56x56 256->128", (100, 56, 56, 256), (1, 1, 256, 128), 1, 1, 675),
]


def bench_conv(in_shape, k_shape, stride, fgc, iters=300, k_inputs=4):
    """Time one conv signature standalone.  Harness rules learned the
    hard way (earlier revisions produced >4x-MXU-peak numbers):
    - no weight perturbation (conv(x, w*c) -> conv(x,w)*c is hoisted);
    - no cross-iteration scalar dependence (each iteration then pays a
      fixed ~0.1 ms latency chain, flooring small kernels);
    - instead scan over a rotating index into K distinct inputs — no
      interdependence, nothing loop-invariant, kernels run back-to-back.
    """
    rs = np.random.RandomState(0)
    xs = jnp.asarray(rs.randn(k_inputs, *in_shape), jnp.bfloat16)
    w = jnp.asarray(rs.randn(*k_shape) * 0.01, jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(in_shape, k_shape,
                                        ("NHWC", "HWIO", "NHWC"))

    out_shape = (in_shape[0], in_shape[1] // stride, in_shape[2] // stride,
                 k_shape[3])

    @jax.jit
    def run(xs, w):
        def body(c, i):
            xi = jax.lax.dynamic_index_in_dim(xs, i, keepdims=False)
            y = jax.lax.conv_general_dilated(
                xi, w, window_strides=(stride, stride), padding="SAME",
                dimension_numbers=dn, feature_group_count=fgc)
            # accumulate the FULL output (a y[0,0,0] slice-sum gets
            # pushed through the conv by the simplifier, computing one
            # output pixel); costs read+write of the accumulator, so
            # traffic per iter = in + w + 2*out (accounted below)
            return c + y, jnp.bfloat16(0.0)
        acc, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.bfloat16),
                              jnp.arange(iters) % k_inputs)
        return jnp.sum(acc)

    # host-materialization sync: over the axon tunnel block_until_ready
    # returns before execution completes (see DESIGN §11 / bench tools)
    float(run(xs, w))                      # compile + warm
    t0 = time.perf_counter()
    float(run(xs, w))
    dt = (time.perf_counter() - t0) / iters
    out_n = int(np.prod(out_shape))
    # actual traffic: in + w + accumulator read + accumulator write
    byts = 2 * (np.prod(in_shape) + np.prod(k_shape) + 2 * out_n)
    flops = 2 * out_n * k_shape[0] * k_shape[1] * k_shape[2]
    return dt, byts / dt / 1e9, flops / dt / 1e12


def main():
    print(f"{'case':28} {'ms':>7} {'GB/s':>6} {'TFLOPS':>7} "
          f"{'in-step GB/s':>13}")
    rows = {}
    for name, in_shape, k_shape, stride, fgc, instep in CASES:
        dt, gbps, tf = bench_conv(in_shape, k_shape, stride, fgc)
        rows[name] = round(gbps)
        print(f"{name:28} {dt*1e3:7.2f} {gbps:6.0f} {tf:7.1f} {instep:13.0f}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
