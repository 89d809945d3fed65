#!/usr/bin/env python
"""Decompose distill-step time on the headline config.

Measures, on the current default device:
  1. transfer: host->device time for the four flat expert vectors
  2. fwd:      grand_loss forward only (no meta-grad)
  3. step:     full jitted outer step, device-resident inputs
  4. step_np:  full outer step fed numpy inputs each call (upload incl.)

Env knobs: P_INNER_DTYPE (float32|bfloat16), P_REMAT (1|0),
P_SYN_STEPS, P_NQ, P_MB, P_ITERS.
"""

import functools
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    inner_dtype = os.environ.get("P_INNER_DTYPE", "float32")
    remat = os.environ.get("P_REMAT", "1") == "1"
    syn_steps = int(os.environ.get("P_SYN_STEPS", "8"))
    nq = int(os.environ.get("P_NQ", "100"))
    mb = int(os.environ.get("P_MB", "100"))
    iters = int(os.environ.get("P_ITERS", "5"))

    cfg = Config(image_encoder="nfnet", image_size=224, num_queries=nq,
                 syn_steps=syn_steps, mini_batch_size=mb, expert_epochs=1,
                 inner_dtype=inner_dtype, remat_inner=remat,
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0)
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(nq, 224, 224, 3).astype(np.float32)
    text_syn = rng.randn(nq, 768).astype(np.float32)

    d = Distiller(cfg, model, variables, image_syn, text_syn)
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    img_th0 = np.asarray(img_flat)
    txt_th0 = np.asarray(txt_flat)
    img_tgt = img_th0 + 0.01 * rng.randn(*img_th0.shape).astype(np.float32)
    txt_tgt = txt_th0 + 0.01 * rng.randn(*txt_th0.shape).astype(np.float32)
    print(f"flat sizes: img={img_th0.size/1e6:.1f}M txt={txt_th0.size/1e6:.1f}M; "
          f"dtype={inner_dtype} remat={remat} syn_steps={syn_steps} nq={nq} mb={mb}")

    def timeit(name, fn, n=iters):
        fn()  # warmup / compile
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.1f} ms")
        return dt

    # 1. pure transfer
    def xfer():
        a = jax.device_put(img_th0)
        b = jax.device_put(txt_th0)
        c = jax.device_put(img_tgt)
        e = jax.device_put(txt_tgt)
        jax.block_until_ready((a, b, c, e))
    timeit("transfer 4 flats", xfer)

    dev_in = [jax.device_put(x) for x in (img_th0, txt_th0, img_tgt, txt_tgt)]
    jax.block_until_ready(dev_in)

    idx = d.sample_indices(rng)
    keys = jax.random.split(jax.random.PRNGKey(0), syn_steps)

    # 2. grand_loss forward only
    gl = jax.jit(d.grand_loss)
    def fwd():
        out = gl(d.state.image_syn, d.state.text_syn, d.state.syn_lr_img,
                 d.state.syn_lr_txt, *dev_in, jnp.asarray(idx), keys)
        jax.block_until_ready(out)
    timeit("grand_loss fwd", fwd)

    # 3. full step, device-resident
    def step_dev():
        m = d._step(d.state, *dev_in, jnp.asarray(idx), keys[0])
        # NOTE: _step donates state; re-assign so next call is valid
        d.state = m[0]
        jax.block_until_ready(m[1]["grand_loss"])
    timeit("full step (device inputs)", step_dev)

    # 4. full step with fresh numpy uploads (what bench.py measured)
    def step_np():
        m = d.step(img_th0, txt_th0, img_tgt, txt_tgt, idx)
        jax.block_until_ready(m["grand_loss"])
    timeit("full step (numpy inputs)", step_np)


if __name__ == "__main__":
    main()
