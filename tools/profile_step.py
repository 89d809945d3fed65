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
        jax.block_until_ready(m["grand_loss"])

    one()  # compile
    one()
    with jax.profiler.trace(out_dir):
        one()
        one()

    planes = sorted(glob.glob(os.path.join(
        out_dir, "plugins/profile/*/*.xplane.pb")))
    if not planes:
        print(json.dumps({"error": "no xplane captured", "dir": out_dir}))
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [planes[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    rows = list(csv.reader(io.StringIO(data)))
    hdr = rows[0]
    print("columns:", hdr)

    def col(name):
        for i, h in enumerate(hdr):
            if name.lower() in h.lower():
                return i
        return None

    c_time = col("total time")
    if c_time is None:
        c_time = col("occurrences") and col("time")
    c_name = col("hlo op name") or col("op name") or 1
    c_cat = col("category")
    body = rows[1:]
    try:
        body.sort(key=lambda r: -float(r[c_time]))
    except Exception:
        pass
    for r in body[:40]:
        nm = r[c_name][:90] if c_name is not None else r
        cat = r[c_cat] if c_cat is not None else ""
        print(f"{float(r[c_time]):>14.1f}  {cat:<22} {nm}")


if __name__ == "__main__":
    main()
