#!/usr/bin/env python
"""Decompose the forward-HVP outer step into its compute stages (run on TPU).

The headline outer step = scan over syn_steps of [inner fwd+bwd] + a
meta-backward that is, per step, one grad-of-jvp (reverse-over-forward,
engine/distill.py fr_core_bwd).  This tool times, as separate compiled
programs on the same shapes:

  A. inner_grad x syn_steps : jax.grad(closs) scanned, NO meta-gradient
                              (3 fwd-equivalents/step of useful work)
  B. hvp_bwd x syn_steps    : the grad-of-jvp alone, scanned on fixed
                              residuals (~6 fwd-equivalents/step)
  C. full outer step        : what bench.py measures

If t_C >> t_A + t_B the loss is in scheduling/stitching; if t_A dominates
roofline says the plain fwd+bwd kernels are the target (layouts/fusions);
if t_B dominates the HVP transpose kernels are.

Env: D_ITERS=6
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

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    setup_compilation_cache()
    iters = int(os.environ.get("D_ITERS", "6"))
    if os.environ.get("D_TINY") == "1":  # CPU smoke-test config
        cfg = Config(image_encoder="convnet_tiny", image_size=32,
                     num_queries=8, syn_steps=8, mini_batch_size=8,
                     expert_epochs=1, lr_teacher_img=0.1,
                     lr_teacher_txt=0.1, seed=0, hvp_mode="forward")
    else:
        cfg = Config(image_encoder="nfnet", image_size=224, num_queries=100,
                     syn_steps=8, mini_batch_size=100, expert_epochs=1,
                     lr_img=1000.0, lr_txt=1000.0, lr_lr=1e-2,
                     lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0,
                     inner_dtype="bfloat16", scan_unroll=8,
                     hvp_mode="forward")
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(cfg.num_queries, cfg.image_size, cfg.image_size,
                          3).astype(np.float32)
    text_syn = rng.randn(cfg.num_queries, 768).astype(np.float32)
    d = Distiller(cfg, model, variables, image_syn, text_syn)
    # rebuild closs exactly as _build_step does
    inner_dtype = (jnp.bfloat16 if cfg.inner_dtype == "bfloat16"
                   else jnp.float32)
    from multimodal_dataset_distillation_tpu.engine.distill import (
        RAW_LOG_SCALE,
        _sym_ce,
    )

    def closs(thi, tht, x, y, lr_i, ki, kt):
        # thi/tht are param TREES (the production scan carry)
        f = d._img_forward_tree(thi, x, ki, inner_dtype).astype(jnp.float32)
        g = d._txt_forward_tree(tht, y, kt, inner_dtype).astype(jnp.float32)
        f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
        g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
        logits = RAW_LOG_SCALE * jnp.dot(
            f, g.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        return _sym_ce(logits)

    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    thi0 = d._unravel_img(jnp.asarray(np.asarray(img_flat)))
    tht0 = d._unravel_txt(jnp.asarray(np.asarray(txt_flat)))
    xs = jnp.asarray(image_syn[:cfg.mini_batch_size], inner_dtype)
    ys = jnp.asarray(text_syn[:cfg.mini_batch_size], inner_dtype)
    key = jax.random.PRNGKey(0)
    tmap = jax.tree_util.tree_map

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    # A: scanned inner grad (the "useful" trajectory work, no meta-grad)
    @jax.jit
    def scanned_inner(thi, tht, x, y, k):
        def step(carry, kk):
            a, b = carry
            ki, kt = jax.random.split(kk)
            gi, gt = jax.grad(closs, argnums=(0, 1))(
                a, b, x, y, jnp.float32(0.1), ki, kt)
            return (tmap(lambda p, g: p - 0.1 * g, a, gi),
                    tmap(lambda p, g: p - 0.1 * g, b, gt)), None

        keys = jax.random.split(k, 8)
        (a, b), _ = jax.lax.scan(step, (thi, tht), keys, unroll=8)
        return a, b

    t_a = timeit(scanned_inner, thi0, tht0, xs, ys, key)
    print(json.dumps({"stage": "A_inner_grad_x8", "sec": round(t_a, 4)}),
          flush=True)

    # B: scanned grad-of-jvp on fixed residuals (the meta-backward's body)
    @jax.jit
    def scanned_hvp(thi, tht, x, y, vi, vt, k):
        def step(carry, kk):
            a, b = carry
            ki, kt = jax.random.split(kk)

            def h_fn(thi_, tht_, x_, y_, lr_i_):
                _, dh = jax.jvp(
                    lambda p, q: closs(p, q, x_, y_, lr_i_, ki, kt),
                    (thi_, tht_), (vi, vt))
                return dh

            hg = jax.grad(h_fn, argnums=(0, 1, 2, 3, 4))(
                a, b, x, y, jnp.float32(0.1))
            return (tmap(lambda p, g: p - 1e-4 * g, a, hg[0]),
                    tmap(lambda p, g: p - 1e-4 * g, b, hg[1])), (
                        hg[2].sum(), hg[3].sum())

        keys = jax.random.split(k, 8)
        (a, b), aux = jax.lax.scan(step, (thi, tht), keys, unroll=8)
        return a, b, aux

    vi = tmap(lambda p: 1e-3 * p, thi0)
    vt = tmap(lambda p: 1e-3 * p, tht0)
    t_b = timeit(scanned_hvp, thi0, tht0, xs, ys, vi, vt, key)
    print(json.dumps({"stage": "B_hvp_bwd_x8", "sec": round(t_b, 4)}),
          flush=True)

    # C: the real outer step
    i0 = np.asarray(img_flat)
    t0 = np.asarray(txt_flat)
    traj_i = d.put_trajectory(np.stack([i0, i0 * 1.01]))
    traj_t = d.put_trajectory(np.stack([t0, t0 * 1.01]))

    def full():
        m = d.step_traj(traj_i, traj_t, 0, d.sample_indices(rng))
        return m["grand_loss"]

    t_c = timeit(lambda: full())
    print(json.dumps({"stage": "C_full_outer_step", "sec": round(t_c, 4),
                      "a_plus_b": round(t_a + t_b, 4)}), flush=True)


if __name__ == "__main__":
    main()
