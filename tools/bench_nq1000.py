#!/usr/bin/env python
"""Table-A-largest-row stress: nq=1000, syn_steps=8, mb=100 (v5e-1).

Round-3 VERDICT item 9: the reference's largest published configuration
is 1000 synthetic pairs (``images/table.png`` Table A;
``distill.py:510-513`` indexes the same synthetic set regardless of
size).  Synthetic state at nq=1000 is ~600 MB pixels + matching
meta-gradient + momentum (~1.8 GB f32 resident), so the full-unroll
scan (15.6 GB temps at nq=100) does not co-fit — this records the
largest OOM-free setting on one chip.

Env: NQ (default 1000), UNROLL (default 1), ITERS (default 4).
Prints one JSON line per measurement.
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

    nq = int(os.environ.get("NQ", 1000))
    unroll = int(os.environ.get("UNROLL", 1))
    iters = int(os.environ.get("ITERS", 4))
    cfg = Config(image_encoder="nfnet", image_size=224, num_queries=nq,
                 syn_steps=8, mini_batch_size=100, expert_epochs=1,
                 inner_dtype="bfloat16", scan_unroll=unroll,
                 hvp_mode="forward", fr_bwd=os.environ.get("FR_BWD", "rof"),
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0)
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    d = Distiller(cfg, model, variables,
                  rng.randn(nq, 224, 224, 3).astype(np.float32),
                  rng.randn(nq, 768).astype(np.float32))
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0_ = np.asarray(txt_flat)
    traj_i = d.put_trajectory(np.stack([i0, i0 * 1.01]))
    traj_t = d.put_trajectory(np.stack([t0_, t0_ * 1.01]))

    idx = d.sample_indices(rng)
    compiled = d._step_traj.lower(d.state, traj_i, traj_t, np.int32(0),
                                  jnp.asarray(idx),
                                  jax.random.PRNGKey(0)).compile()
    ma = compiled.memory_analysis()
    temp_mib = getattr(ma, "temp_size_in_bytes", 0) / 2**20 if ma else None

    m = d.step_traj(traj_i, traj_t, 0, d.sample_indices(rng))  # warm
    float(m["grand_loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        m = d.step_traj(traj_i, traj_t, 0, d.sample_indices(rng))
    float(m["grand_loss"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "config": f"nq={nq}/syn_steps=8/mb=100/unroll={unroll}"
                  f"/fr_bwd={cfg.fr_bwd}",
        "steps_per_sec": round(1 / dt, 4),
        "temp_mib": round(temp_mib) if temp_mib else None,
        "grand_loss_finite": bool(np.isfinite(float(m["grand_loss"]))),
    }), flush=True)


if __name__ == "__main__":
    main()
