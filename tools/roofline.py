#!/usr/bin/env python
"""Roofline + dispatch analysis of the headline distill step (run on TPU).

Prints, for hvp_mode in {reverse, forward}:
  - exact FLOPs and bytes accessed from compiled.cost_analysis()
  - roofline bounds: flops/197e12 (v5e bf16 peak; 394e12 is the int8
    figure) vs bytes/819e9 (HBM BW)
  - peak HBM from memory_analysis()
and for the faster mode:
  - steps/s with a per-step blocking sync (what bench.py r1 measured)
  - steps/s with async dispatch, syncing only at the end (K in flight) —
    isolates host/tunnel dispatch latency from device compute.

Env: R_MODES=forward,reverse  R_ITERS=12
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(mode):
    import jax
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )

    setup_compilation_cache()

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    cfg = Config(image_encoder="nfnet", image_size=224, num_queries=100,
                 syn_steps=8, mini_batch_size=100, expert_epochs=1,
                 lr_img=1000.0, lr_txt=1000.0, lr_lr=1e-2,
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0,
                 inner_dtype="bfloat16", scan_unroll=8, hvp_mode=mode)
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    d = Distiller(cfg, model, variables,
                  rng.randn(100, 224, 224, 3).astype(np.float32),
                  rng.randn(100, 768).astype(np.float32))
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0 = np.asarray(txt_flat)
    traj_i = d.put_trajectory(np.stack(
        [i0, i0 + 0.01 * rng.randn(*i0.shape).astype(np.float32)]))
    traj_t = d.put_trajectory(np.stack(
        [t0, t0 + 0.01 * rng.randn(*t0.shape).astype(np.float32)]))
    return d, rng, traj_i, traj_t


def analyze(mode):
    import jax
    import jax.numpy as jnp

    d, rng, traj_i, traj_t = build(mode)
    idx = d.sample_indices(rng)
    lowered = d._step_traj.lower(d.state, traj_i, traj_t, np.int32(0),
                                 jnp.asarray(idx), jax.random.PRNGKey(0))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ma = compiled.memory_analysis()
    flops = float(ca.get("flops", float("nan")))
    byt = float(ca.get("bytes accessed", float("nan")))
    out = {
        "mode": mode,
        "flops_per_step": flops,
        "bytes_accessed": byt,
        "mxu_bound_s": flops / 197e12,
        "hbm_bound_s": byt / 819e9,
        "temp_mib": getattr(ma, "temp_size_in_bytes", 0) / 2**20 if ma else None,
    }
    print(json.dumps(out), flush=True)
    return d, rng, traj_i, traj_t


def timed(mode, iters):
    import jax

    d, rng, traj_i, traj_t = build(mode)

    def one(sync):
        m = d.step_traj(traj_i, traj_t, 0, d.sample_indices(rng))
        if sync:
            float(m["grand_loss"])
        return m

    # warmup/compile
    float(one(True)["grand_loss"])
    float(one(True)["grand_loss"])

    t0 = time.perf_counter()
    for _ in range(iters):
        one(True)
    sync_dt = (time.perf_counter() - t0) / iters

    t0 = time.perf_counter()
    last = None
    for _ in range(iters):
        last = one(False)
    float(last["grand_loss"])  # drain the pipeline
    async_dt = (time.perf_counter() - t0) / iters

    print(json.dumps({
        "mode": mode,
        "steps_per_sec_sync_every_step": round(1 / sync_dt, 4),
        "steps_per_sec_async_dispatch": round(1 / async_dt, 4),
        "per_step_host_overhead_ms": round((sync_dt - async_dt) * 1e3, 1),
    }), flush=True)


def main():
    modes = os.environ.get("R_MODES", "forward,reverse").split(",")
    iters = int(os.environ.get("R_ITERS", "12"))
    for m in modes:
        analyze(m)
    timed(modes[0], iters)


if __name__ == "__main__":
    main()
