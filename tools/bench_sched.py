#!/usr/bin/env python
"""XLA:TPU scheduler-knob A/B on the headline distill step (v5e-1).

DESIGN.md §10's round-3 conclusion was that the 15.6 GB temp footprint
is a *scheduler choice*: XLA's latency-hiding scheduler expands
interleaving of the unrolled inner steps until HBM is full (temps pin at
~15.6 GB in every program variant), trading ~175 GiB/step of spill/copy
DMA for overlap.  Every *program-side* lever (remat orientation,
residual dtype, carry format, unroll) was measured neutral — but the
scheduler's own knobs were never turned.  This tool turns them, via
``compiled = jitted.lower(...).compile(compiler_options=...)`` (verified
to propagate through the axon remote-compile tunnel: a bogus flag is
rejected by the remote compiler).

Knobs under test:
  - ``xla_tpu_scheduler_percent_shared_memory_limit`` — the HBM fraction
    the latency-hiding scheduler targets (the literal "fills HBM to
    100%" knob).
  - ``xla_tpu_enable_latency_hiding_scheduler`` — off = plain
    post-order scheduling, minimal live ranges, no overlap.
  - ``xla_tpu_async_copy_bandwidth_scaling_factor`` — scales the
    scheduler's copy-cost model (lower = copies look slower = less
    eager spill/copy insertion).

Runs ONE variant per process (compiler options come in via
``SCHED_OPTS`` as a JSON object; empty = control) so each measurement
gets a clean HBM arena; prints one JSON line.  Timing protocol is
bench.py's: pipelined dispatch, host sync on the previous step's
metrics, warmup excluded.

Env: SCHED_OPTS (JSON dict, default {}), ITERS (default 8).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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

    opts = json.loads(os.environ.get("SCHED_OPTS", "{}"))
    iters = int(os.environ.get("ITERS", 8))

    # the exact headline config from bench.py's on_tpu branch
    cfg = Config(image_encoder="nfnet", image_size=224, num_queries=100,
                 syn_steps=8, mini_batch_size=100, expert_epochs=1,
                 lr_img=1000.0, lr_txt=1000.0, lr_lr=1e-2,
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0,
                 inner_dtype="bfloat16", scan_unroll=8, hvp_mode="forward")
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    d = Distiller(cfg, model, variables,
                  rng.randn(100, 224, 224, 3).astype(np.float32),
                  rng.randn(100, 768).astype(np.float32))
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0_ = np.asarray(txt_flat)
    traj_i = d.put_trajectory(np.stack(
        [i0, i0 + 0.01 * rng.randn(*i0.shape).astype(np.float32)]))
    traj_t = d.put_trajectory(np.stack(
        [t0_, t0_ + 0.01 * rng.randn(*t0_.shape).astype(np.float32)]))

    idx0 = jnp.asarray(d.sample_indices(rng))
    lowered = d._step_traj.lower(d.state, traj_i, traj_t, np.int32(0),
                                 idx0, jax.random.PRNGKey(0))
    t_c = time.perf_counter()
    try:
        compiled = lowered.compile(compiler_options=opts or None)
    except Exception as e:  # OOM or rejected flag: record, don't crash
        print(json.dumps({"opts": opts, "error": str(e)[:300]}), flush=True)
        return
    compile_s = time.perf_counter() - t_c
    ma = compiled.memory_analysis()
    temp_mib = getattr(ma, "temp_size_in_bytes", 0) / 2**20 if ma else None

    state = d.state
    key = jax.random.PRNGKey(0)

    def dispatch(state, i):
        idx = jnp.asarray(d.sample_indices(rng))
        return compiled(state, traj_i, traj_t, np.int32(0), idx,
                        jax.random.fold_in(key, i))

    try:
        for w in range(2):  # warmup
            state, m = dispatch(state, w)
            float(m["grand_loss"])
        t0 = time.perf_counter()
        pending = None
        for i in range(iters):
            state, m = dispatch(state, 100 + i)
            if pending is not None:
                float(pending["grand_loss"])
            pending = m
        last = float(pending["grand_loss"])
        dt = time.perf_counter() - t0
    except Exception as e:  # runtime OOM etc.
        print(json.dumps({"opts": opts, "temp_mib": temp_mib,
                          "error": str(e)[:300]}), flush=True)
        return
    print(json.dumps({
        "opts": opts,
        "steps_per_sec": round(iters / dt, 4),
        "temp_mib": round(temp_mib) if temp_mib else None,
        "compile_s": round(compile_s, 1),
        "grand_loss_finite": bool(np.isfinite(last)),
    }), flush=True)


if __name__ == "__main__":
    main()
