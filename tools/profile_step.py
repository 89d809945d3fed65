#!/usr/bin/env python
"""Per-op time attribution for the headline distill step (run on TPU).

Captures a jax.profiler trace of one post-compile outer step and prints
the top HLO ops by self time (via tensorboard_plugin_profile's xplane
converter) — the data that tells WHERE the HBM-bound step (roofline:
1138 GB accessed vs 77 TFLOP) actually spends its bandwidth.

Env: P_HVP_MODE=forward  P_SCAN_UNROLL=8  P_OUT=/tmp/profile_step
"""

import csv
import glob
import io
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    setup_compilation_cache()
    out_dir = os.environ.get("P_OUT", "/tmp/profile_step")
    cfg = Config(image_encoder="nfnet", image_size=224, num_queries=100,
                 syn_steps=8, mini_batch_size=100, expert_epochs=1,
                 lr_img=1000.0, lr_txt=1000.0, lr_lr=1e-2,
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0,
                 inner_dtype="bfloat16",
                 scan_unroll=int(os.environ.get("P_SCAN_UNROLL", "8")),
                 hvp_mode=os.environ.get("P_HVP_MODE", "forward"))
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
    traj_i = d.put_trajectory(np.stack([i0, i0 * 1.01]))
    traj_t = d.put_trajectory(np.stack([t0, t0 * 1.01]))

    def one():
        m = d.step_traj(traj_i, traj_t, 0, d.sample_indices(rng))
        float(m["grand_loss"])

    one()  # compile
    one()
    with jax.profiler.trace(out_dir):
        one()
        one()

    report(out_dir, n_steps=2)


def report(out_dir: str, n_steps: int = 2):
    """Aggregate the captured chrome trace by HLO category and source
    line (the tensorboard_plugin_profile proto converter is broken
    against the installed TF, so we parse trace.json.gz directly —
    events carry hlo_category / bytes_accessed / source)."""
    import collections
    import gzip

    traces = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        print(json.dumps({"error": "no trace captured", "dir": out_dir}))
        return
    with gzip.open(traces[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tids = {}
    for e in ev:
        if (e.get("ph") == "M" and e.get("name") == "thread_name"
                and e.get("pid") == 3):
            tids[e["tid"]] = e["args"].get("name")
    opthreads = {t for t, n in tids.items() if n == "XLA Ops"}
    by_cat = collections.Counter()
    by_cat_b = collections.Counter()
    by_cat_n = collections.Counter()
    by_src = collections.Counter()
    tot_t = tot_b = 0
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == 3
                and e.get("tid") in opthreads):
            a = e.get("args", {})
            cat = a.get("hlo_category", "?")
            dur = e.get("dur", 0)
            b = int(a.get("bytes_accessed", 0) or 0)
            by_cat[cat] += dur
            by_cat_b[cat] += b
            by_cat_n[cat] += 1
            by_src[a.get("source", "")[:90]] += dur
            tot_t += dur
            tot_b += b
    k = n_steps
    print(f"total: {tot_t/k/1e3:.0f} ms/step, {tot_b/k/2**30:.0f} GiB/step")
    print("\n== by hlo_category (per step) ==")
    for cat, us in by_cat.most_common(16):
        print(f"{us/k/1e3:8.1f} ms {by_cat_b[cat]/k/2**30:8.1f} GiB "
              f"x{by_cat_n[cat]//k:<6} {cat}")
    print("\n== by source line (per step, top 12) ==")
    for src, us in by_src.most_common(12):
        print(f"{us/k/1e3:8.1f} ms  {src}")

    # per-kernel breakdown of the dominant category: which conv fusions
    # run fast/slow (achieved GB/s), keyed by op name (kernel identity)
    by_op_t = collections.Counter()
    by_op_b = collections.Counter()
    by_op_n = collections.Counter()
    op_meta = {}
    for e in ev:
        if (e.get("ph") == "X" and e.get("pid") == 3
                and e.get("tid") in opthreads):
            a = e.get("args", {})
            if a.get("hlo_category", "") not in (
                    "convolution", "convolution fusion", "fusion"):
                continue
            name = e.get("name", "?")
            by_op_t[name] += e.get("dur", 0)
            by_op_b[name] += int(a.get("bytes_accessed", 0) or 0)
            by_op_n[name] += 1
            if name not in op_meta:
                op_meta[name] = (a.get("hlo_category", "?"),
                                 str(a.get("source", ""))[-55:])
    print("\n== top kernels (conv/fusion cats) by time (per step) ==")
    print(f"{'ms':>8} {'GiB':>7} {'GB/s':>6} {'x':>5}  kernel [category] source")
    for name, us in by_op_t.most_common(28):
        b = by_op_b[name]
        gbps = (b / 2**30 * 1.074) / (us / 1e6) if us else 0
        cat, src = op_meta[name]
        print(f"{us/k/1e3:8.2f} {b/k/2**30:7.2f} {gbps:6.0f} "
              f"{by_op_n[name]//k:5d}  {name[:46]} [{cat}] {src}")


if __name__ == "__main__":
    if len(sys.argv) > 1:  # report-only on an existing capture dir
        report(sys.argv[1])
    else:
        main()
