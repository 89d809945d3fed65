#!/usr/bin/env python
"""Expert-phase roofline (round-3 VERDICT item 4; run on TPU).

The distill step got the full roofline treatment in round 2 (DESIGN.md
§10); this gives the expert phase (``buffer.py`` hot loop #1,
``epoch_original.py:20-62``) the same: exact FLOPs/bytes of the jitted
train step from ``compiled.cost_analysis()``, measured step time on
device-resident batches, achieved MFU/BW, and the derived headline
numbers — img/s and Flickr30K expert epochs/hr (BASELINE north-star
metric #2; 145k caption pairs/epoch) — for f32 and bf16 (the fork's AMP
epoch) and with/without on-device RandAugment.

Pairs with ``tools/bench_loader.py`` (host loader img/s) to decide
input- vs compute-bound: the phase is input-bound iff loader img/s <
step img/s.

Env: RE_MODES=float32,bfloat16  RE_BATCH=128  RE_ITERS=20
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # v5e bf16 peak (394e12 is the int8 figure)
V5E_F32_PEAK = 98e12    # v5e has no f32 MXU mode; XLA uses bf16x3 ~ 1/2
V5E_HBM_BW = 819e9
FLICKR_PAIRS_PER_EPOCH = 145_000  # 29k images x 5 captions (train JSON)


def bench(train_dtype: str, device_augment: bool, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.expert import (
        BiEncoderTrainer,
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        build_bi_encoder,
    )

    cfg = Config(image_encoder="nfnet", image_size=224,
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, mom=0.0, l2=0.0,
                 train_dtype=train_dtype, seed=0)
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    trainer = BiEncoderTrainer(
        model, variables, lr_img=0.1, lr_txt=0.1, momentum=0.0,
        weight_decay=0.0, seed=0, compute_dtype=train_dtype,
        device_augment=device_augment)

    rng = np.random.RandomState(0)
    if device_augment:
        images = rng.randint(0, 255, (batch, 224, 224, 3)).astype(np.float32)
    else:
        images = rng.randn(batch, 224, 224, 3).astype(np.float32)
    texts = rng.randn(batch, 768).astype(np.float32)
    jimg, jtxt = jnp.asarray(images), jnp.asarray(texts)

    # cost analysis of the exact step program
    key = jax.random.PRNGKey(0)
    lowered = trainer._step.lower(trainer.variables, trainer.opt_img,
                                  trainer.opt_txt, jimg, jtxt, key)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    byt = float(ca.get("bytes accessed", float("nan")))

    # timed loop, device-resident inputs, host sync only at the end.
    # NB sync via float() (host materialization): block_until_ready on a
    # remote-tunnel array has been observed returning before the queue
    # drains (measured 1.7 ms/step "times", 4.8x over the MXU peak bound
    # — impossible), while float() is the proven bench.py pattern.
    for _ in range(2):  # compile + warm
        out = trainer._step(trainer.variables, trainer.opt_img,
                            trainer.opt_txt, jimg, jtxt, key)
        float(out[3])
    t0 = time.perf_counter()
    state = (trainer.variables, trainer.opt_img, trainer.opt_txt)
    for i in range(iters):
        key, sub = jax.random.split(key)
        out = trainer._step(*state, jimg, jtxt, sub)
        state = out[:3]
    float(out[3])
    dt = (time.perf_counter() - t0) / iters

    peak = V5E_BF16_PEAK if train_dtype == "bfloat16" else V5E_F32_PEAK
    img_s = batch / dt
    print(json.dumps({
        "config": f"expert_step/{train_dtype}"
                  + ("+device_augment" if device_augment else ""),
        "batch": batch,
        "step_ms": round(dt * 1e3, 2),
        "img_per_sec": round(img_s, 1),
        "flickr_epochs_per_hr": round(3600 * img_s / FLICKR_PAIRS_PER_EPOCH, 2),
        "tflop_per_step": round(flops / 1e12, 3),
        "gb_accessed": round(byt / 1e9, 1),
        "mxu_bound_ms": round(flops / peak * 1e3, 2),
        "hbm_bound_ms": round(byt / V5E_HBM_BW * 1e3, 2),
        "achieved_mfu": round(flops / dt / peak, 3),
        "achieved_gbps": round(byt / dt / 1e9, 1),
    }), flush=True)


def main():
    modes = os.environ.get("RE_MODES", "float32,bfloat16").split(",")
    batch = int(os.environ.get("RE_BATCH", "128"))
    iters = int(os.environ.get("RE_ITERS", "20"))
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )

    setup_compilation_cache()
    for m in modes:
        bench(m, False, batch, iters)
    bench("bfloat16", True, batch, iters)


if __name__ == "__main__":
    main()
