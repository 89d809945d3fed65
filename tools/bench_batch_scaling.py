#!/usr/bin/env python
"""Measure per-chip batch-scaling of the headline distill step on v5e-1.

Purpose (VERDICT r4, weak #1 / next #1): the v5e-8 projection in
tools/project_v5e8.py previously rested on an ASSUMED 91.5%/8.5%
batch/fixed work split plus a PRICED x1.5-x3 lane-padding risk for the
mb=13-per-chip shard.  Both are directly measurable on the one real
chip: under the data-parallel sharding each v5e-8 chip runs the exact
headline program on its own shard — nq=13, mb=13 of the padded 104 —
with students replicated, so a single-chip run at (nq=13, mb=13) IS the
per-chip compute of the 8-chip step, minus collectives and dispatch.

This tool runs the shipped headline configuration (NFNet-L0 @224², bf16
inner compute, syn_steps=8, scan_unroll=8, forward-HVP, fused_jvp
default-on) at per-chip shard sizes mb=nq in {13, 26, 52} (= the 8-, 4-,
2-chip shards of the padded 104) plus the mb=nq=100 single-chip control,
and writes measured step times to ``tools/batch_scaling_v5e1.json`` —
which project_v5e8.py then uses INSTEAD of the assumed decomposition.

The only differences between this measurement and a true v5e-8 per-chip
shard are (a) the contrastive logits block is 13x13 here vs 13x104
rows-of-the-global-batch there (~0.1 ms of extra MXU work — negligible
against a ~150 ms step) and (b) pad-row masking arithmetic (elementwise
on a 13-row tensor, negligible).  Everything that was previously a
priced RISK — small-batch conv lane padding, XLA layout choices at
batch 13, fixed-vs-batch work split — is measured, not assumed.

Reference workload being projected: /root/reference/distill.py:509-613
(the unrolled inner loop + meta-backward), BASELINE.json >=3x v5e-8
target.

Usage (on the TPU host):  python tools/bench_batch_scaling.py
Env: BS_SIZES="13,26,52,100"  BS_ITERS=auto  BS_OUT=tools/batch_scaling_v5e1.json
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n: int, iters: int, warmup: int = 2) -> dict:
    """Time the headline step at nq = mb = n on the current device."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        build_bi_encoder)
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    cfg = Config(image_encoder="nfnet", image_size=224, num_queries=n,
                 syn_steps=8, mini_batch_size=n, expert_epochs=1,
                 lr_img=1000.0, lr_txt=1000.0, lr_lr=1e-2,
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0,
                 inner_dtype="bfloat16", scan_unroll=8, hvp_mode="forward")
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(n, 224, 224, 3).astype(np.float32)
    text_syn = rng.randn(n, 768).astype(np.float32)
    d = Distiller(cfg, model, variables, image_syn, text_syn)
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0_ = np.asarray(txt_flat)
    traj_i = d.put_trajectory(np.stack(
        [i0, i0 + 0.01 * rng.randn(*i0.shape).astype(np.float32)]))
    traj_t = d.put_trajectory(np.stack(
        [t0_, t0_ + 0.01 * rng.randn(*t0_.shape).astype(np.float32)]))

    def dispatch():
        return d.step_traj(traj_i, traj_t, 0, d.sample_indices(rng))

    tc0 = time.perf_counter()
    for _ in range(warmup):
        float(dispatch()["grand_loss"])
    compile_s = time.perf_counter() - tc0

    # pipelined timing, same discipline as bench.py (step N+1 dispatched
    # before step N's metrics are pulled, so the tunnel round-trip hides)
    t0 = time.perf_counter()
    pending = None
    for _ in range(iters):
        m = dispatch()
        if pending is not None:
            float(pending["grand_loss"])
        pending = m
    float(pending["grand_loss"])
    dt = time.perf_counter() - t0
    row = {
        "n": n, "step_ms": round(dt / iters * 1e3, 1),
        "steps_per_sec": round(iters / dt, 4), "iters": iters,
        "warmup_incl_compile_s": round(compile_s, 1),
    }
    del d, traj_i, traj_t
    return row


def main():
    import jax

    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache)

    setup_compilation_cache()
    platform = jax.devices()[0].platform
    print(f"platform: {platform}", file=sys.stderr)
    on_tpu = platform != "cpu"
    sizes = [int(s) for s in os.environ.get(
        "BS_SIZES", "13,26,52,100").split(",")]
    out_path = os.environ.get(
        "BS_OUT", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "batch_scaling_v5e1.json"))
    rows = []
    for n in sizes:
        # smaller steps are faster — more iters for stable timing
        iters = int(os.environ.get("BS_ITERS", "0")) or max(
            10, min(40, int(round(1500 / max(n, 1)))))
        row = measure(n, iters)
        rows.append(row)
        print(json.dumps(row), flush=True)

    result = {"rows": rows, "platform": platform,
              "config": "nfnet_l0 224^2 bf16 unroll=8 hvp=forward "
                        "fused_jvp=on nq=mb=n",
              "valid_for_projection": bool(on_tpu)}
    if len(rows) >= 2:
        # least-squares linear fit t(n) = fixed_ms + per_sample_ms * n
        ns = np.array([r["n"] for r in rows], dtype=np.float64)
        ts = np.array([r["step_ms"] for r in rows], dtype=np.float64)
        A = np.stack([np.ones_like(ns), ns], axis=1)
        (fixed_ms, per_sample_ms), res, *_ = np.linalg.lstsq(A, ts, rcond=None)
        result["fit"] = {
            "fixed_ms": round(float(fixed_ms), 1),
            "per_sample_ms": round(float(per_sample_ms), 3),
            "resid_ms": round(float(np.sqrt(res[0] / len(ns)))
                              if len(res) else 0.0, 2),
        }
        t100 = next((r["step_ms"] for r in rows if r["n"] == 100), None)
        t13 = next((r["step_ms"] for r in rows if r["n"] == 13), None)
        if t100 and t13:
            # how much worse the mb=13 shard is than ideal linear scaling
            # of the mb=100 batch work (this is the measured value of the
            # previously-priced R1 lane-padding multiplier, folded
            # together with the measured fixed work)
            result["t13_over_linear13"] = round(
                t13 / (float(fixed_ms) + float(per_sample_ms) * 13), 3)
    if on_tpu:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {out_path}", file=sys.stderr)
    else:
        print("CPU run — NOT writing projection inputs (no fake TPU "
              "numbers)", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
