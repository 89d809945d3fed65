#!/usr/bin/env python
"""Conv-instruction census of the distill step: fused_jvp ON vs OFF.

Lowers the full outer step (forward-HVP, fr_bwd="rof") for an NF
student and counts convolution instructions in the optimized HLO —
the structural effect of the merged-tangent conv rule
(ops/fused_jvp.py) before any TPU timing: every merged pair is one
fewer conv and one fewer read of its shared activation operand.

Env: MODEL (nf_tiny|nfnet, default nf_tiny), H (default 32),
SYN_STEPS (default 2).  CPU-friendly at the defaults.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def census(fused: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    name = os.environ.get("MODEL", "nf_tiny")
    H = int(os.environ.get("H", "32"))
    steps = int(os.environ.get("SYN_STEPS", "2"))
    emb = 128 if name == "nf_tiny" else 2304
    cfg = Config(image_encoder=name, image_size=H, num_queries=4,
                 syn_steps=steps, mini_batch_size=2, lr_img=10.0,
                 lr_txt=10.0, lr_lr=1e-2, lr_teacher_img=0.05,
                 lr_teacher_txt=0.05, hvp_mode="forward", fr_bwd="rof",
                 fused_jvp=fused, seed=0)
    model = VLBiEncoder(image_encoder_name=name, text_embedding=768,
                        image_embedding=emb, proj_dropout=0.0)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    d = Distiller(cfg, model, variables,
                  rng.randn(4, H, H, 3).astype(np.float32),
                  rng.randn(4, 768).astype(np.float32))
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0 = np.asarray(txt_flat)
    traj_i = d.put_trajectory(np.stack([i0, i0 * 1.01]))
    traj_t = d.put_trajectory(np.stack([t0, t0 * 1.01]))
    idx = jnp.asarray(d.sample_indices(rng))
    lowered = d._step_traj.lower(d.state, traj_i, traj_t, np.int32(0),
                                 idx, jax.random.PRNGKey(0))
    txt = lowered.compile().as_text()
    return txt.count("convolution(")


def main():
    off = census(False)
    on = census(True)
    print(f"conv instructions: plain={off} fused={on} "
          f"({100.0 * (off - on) / off:.1f}% fewer)")


if __name__ == "__main__":
    main()
