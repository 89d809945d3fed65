"""Distillation engine correctness: meta-gradients, state updates, NaN guard.

The one place exactness matters most (SURVEY.md §4c): finite-difference
check of d(trajectory loss)/d(image_syn, text_syn, syn_lr) on a tiny
model, run in float64 where FD is numerically meaningful.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.engine.distill import Distiller
from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder
from multimodal_dataset_distillation_tpu.utils.flat import flatten_params


def tiny_setup(num_queries=8, syn_steps=2, image_size=16,
               inner_scale="fixed", inner_dtype="float32", dtype=np.float32):
    cfg = Config(
        image_encoder="convnet_tiny", image_size=image_size,
        num_queries=num_queries, syn_steps=syn_steps, mini_batch_size=4,
        lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
        lr_teacher_img=0.05, lr_teacher_txt=0.05,
        inner_scale=inner_scale, inner_dtype=inner_dtype, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    variables = jax.tree_util.tree_map(lambda x: x.astype(dtype), variables)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(num_queries, image_size, image_size, 3).astype(dtype)
    text_syn = rng.randn(num_queries, 768).astype(dtype)
    d = Distiller(cfg, model, variables, image_syn, text_syn)

    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    img_th0 = np.asarray(img_flat)
    txt_th0 = np.asarray(txt_flat)
    img_tgt = (img_th0 + 0.01 * rng.randn(*img_th0.shape)).astype(dtype)
    txt_tgt = (txt_th0 + 0.01 * rng.randn(*txt_th0.shape)).astype(dtype)
    return cfg, d, img_th0, txt_th0, img_tgt, txt_tgt


def test_step_updates_state_and_is_finite():
    cfg, d, i0, t0, it, tt = tiny_setup()
    before_img = np.asarray(d.state.image_syn).copy()
    before_lr = float(d.state.syn_lr_img)
    idx = d.sample_indices(np.random.RandomState(0))
    m = d.step(i0, t0, it, tt, idx)
    assert np.isfinite(float(m["grand_loss"]))
    assert float(m["img_param_loss"]) > 0
    assert not np.allclose(np.asarray(d.state.image_syn), before_img)
    assert float(d.state.syn_lr_img) != before_lr
    # metrics contract: the pipelined CLI loop reads everything host-side
    # from the previous step's metrics (cli/distill.py drain()) — these
    # keys must exist so the donated state is never touched mid-flight
    for k in ("grand_loss", "img_param_loss", "txt_param_loss",
              "syn_lr_img", "syn_lr_txt", "syn_lr_img_grad",
              "syn_lr_txt_grad"):
        assert k in m, f"metrics missing {k}"
    # post-step LR in metrics == the state's LR
    assert float(m["syn_lr_img"]) == float(d.state.syn_lr_img)


@pytest.mark.parametrize("inner_scale", ["fixed", "syn_lr"])
def test_meta_gradient_finite_difference(inner_scale):
    with jax.enable_x64():
        cfg, d, i0, t0, it, tt = tiny_setup(
            inner_scale=inner_scale, inner_dtype="float64", dtype=np.float64)
        idx = jnp.asarray(d.sample_indices(np.random.RandomState(1)))
        keys = jax.random.split(jax.random.PRNGKey(7), cfg.syn_steps)
        args = (d.state.image_syn, d.state.text_syn,
                d.state.syn_lr_img, d.state.syn_lr_txt,
                jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it),
                jnp.asarray(tt), idx, keys)

        loss_f = lambda *a: d.grand_loss(*a)[0]
        grads = jax.grad(loss_f, argnums=(0, 1, 2, 3))(*args)

        def loss_at(image_syn, text_syn, lr_i, lr_t):
            return float(loss_f(image_syn, text_syn, lr_i, lr_t, *args[4:]))

        # FD on the two learnable inner LRs
        eps = 1e-6
        for k, name in ((2, "lr_img"), (3, "lr_txt")):
            a = list(args[:4])
            a[k] = args[k] + eps
            up = loss_at(*a)
            a[k] = args[k] - eps
            down = loss_at(*a)
            fd = (up - down) / (2 * eps)
            an = float(grads[k])
            assert np.isfinite(fd) and np.isfinite(an)
            assert abs(fd - an) < 1e-4 * max(1.0, abs(fd)), (name, fd, an)

        # directional FD on synthetic pixels / text embeddings
        rng = np.random.RandomState(3)
        eps = 1e-5
        for k, name in ((0, "pixels"), (1, "texts")):
            v = rng.randn(*args[k].shape)
            v /= np.linalg.norm(v)
            v = jnp.asarray(v)
            a = list(args[:4])
            a[k] = args[k] + eps * v
            up = loss_at(*a)
            a[k] = args[k] - eps * v
            down = loss_at(*a)
            fd = (up - down) / (2 * eps)
            an = float(jnp.vdot(grads[k], v))
            assert np.isfinite(fd) and np.isfinite(an)
            assert abs(fd - an) < 1e-3 * max(1e-8, abs(fd), abs(an)), \
                (name, fd, an)


def test_zero_steps_matches_start():
    # zero inner LR -> student never moves -> normalized losses == 1 exactly
    cfg, d, i0, t0, it, tt = tiny_setup(syn_steps=1)
    idx = jnp.asarray(d.sample_indices(np.random.RandomState(2)))
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    loss, (il, tl) = d.grand_loss(
        d.state.image_syn, d.state.text_syn,
        jnp.asarray(0.0), jnp.asarray(0.0),
        jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it), jnp.asarray(tt),
        idx, keys)
    assert abs(float(il) - 1.0) < 1e-5
    assert abs(float(tl) - 1.0) < 1e-5


def test_remat_matches_no_remat():
    """jax.checkpoint must not change the meta-gradient."""
    cfg, d, i0, t0, it, tt = tiny_setup()
    cfg2 = cfg.replace(remat_inner=False)
    model = d.model
    d2 = Distiller(cfg2, model,
                   {"params": {"image_encoder": d._unravel_img(jnp.asarray(i0)),
                               "text_projection": d._unravel_txt(jnp.asarray(t0))}},
                   np.asarray(d.state.image_syn), np.asarray(d.state.text_syn))
    idx = jnp.asarray(d.sample_indices(np.random.RandomState(4)))
    keys = jax.random.split(jax.random.PRNGKey(5), cfg.syn_steps)
    args = (d.state.image_syn, d.state.text_syn,
            d.state.syn_lr_img, d.state.syn_lr_txt,
            jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it),
            jnp.asarray(tt), idx, keys)
    g1 = jax.grad(lambda *a: d.grand_loss(*a)[0], argnums=(0, 2))(*args)
    g2 = jax.grad(lambda *a: d2.grand_loss(*a)[0], argnums=(0, 2))(*args)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(g1[1]), float(g2[1]), rtol=1e-4)


def test_step_traj_matches_step():
    """HBM-resident trajectory path == explicit-segment path."""
    cfg, d, i0, t0, it, tt = tiny_setup()
    idx = d.sample_indices(np.random.RandomState(0))
    rng_snapshot = d.rng

    m1 = d.step(i0, t0, it, tt, idx)
    state1 = jax.tree_util.tree_map(np.asarray, d.state)

    # rebuild a fresh distiller with the same seed, drive via step_traj
    cfg2, d2, *_ = tiny_setup()
    d2.rng = rng_snapshot
    # expert_epochs=3 by default: build a trajectory where index 0 is
    # theta_0 and index cfg.expert_epochs is theta*
    T = cfg.expert_epochs + 1
    traj_img = np.stack([i0] + [it] * (T - 1))
    traj_txt = np.stack([t0] + [tt] * (T - 1))
    m2 = d2.step_traj(d2.put_trajectory(traj_img),
                      d2.put_trajectory(traj_txt), 0, idx)
    state2 = jax.tree_util.tree_map(np.asarray, d2.state)

    np.testing.assert_allclose(float(m1["grand_loss"]),
                               float(m2["grand_loss"]), rtol=1e-6)
    np.testing.assert_allclose(state1.image_syn, state2.image_syn,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(state1.text_syn, state2.text_syn,
                               rtol=1e-5, atol=1e-6)


def test_bfloat16_inner_mode_runs_and_tracks_f32():
    """bf16 inner compute: finite, same sign/ballpark as f32 loss."""
    _, d32, i0, t0, it, tt = tiny_setup(inner_dtype="float32")
    _, d16, *_ = tiny_setup(inner_dtype="bfloat16")
    idx = d32.sample_indices(np.random.RandomState(0))
    m32 = d32.step(i0, t0, it, tt, idx)
    m16 = d16.step(i0, t0, it, tt, idx)
    a, b = float(m32["grand_loss"]), float(m16["grand_loss"])
    assert np.isfinite(b)
    assert abs(a - b) / max(abs(a), 1e-6) < 0.2  # coarse agreement


def test_remat_group_matches_plain():
    """Grouped remat is a pure memory/recompute dial: same gradients."""
    with jax.enable_x64():
        cfg, d, i0, t0, it, tt = tiny_setup(syn_steps=4,
                                            inner_dtype="float64",
                                            dtype=np.float64)
        idx = d.sample_indices(np.random.RandomState(0))
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        args = (d.state.image_syn, d.state.text_syn, d.state.syn_lr_img,
                d.state.syn_lr_txt, i0, t0, it, tt, jnp.asarray(idx), keys)
        base = jax.grad(lambda *a: d.grand_loss(*a)[0], argnums=(0, 2))(*args)

        cfg2 = cfg.replace(remat_group=2)
        d2 = Distiller(cfg2, d.model,
                       {"params": {
                           "image_encoder": d._unravel_img(jnp.asarray(i0)),
                           "text_projection": d._unravel_txt(jnp.asarray(t0))}},
                       np.asarray(d.state.image_syn),
                       np.asarray(d.state.text_syn))
        args2 = (d2.state.image_syn, d2.state.text_syn, d2.state.syn_lr_img,
                 d2.state.syn_lr_txt, i0, t0, it, tt, jnp.asarray(idx), keys)
        grouped = jax.grad(lambda *a: d2.grand_loss(*a)[0],
                           argnums=(0, 2))(*args2)
        np.testing.assert_allclose(np.asarray(base[0]),
                                   np.asarray(grouped[0]), rtol=1e-9)
        np.testing.assert_allclose(float(base[1]), float(grouped[1]),
                                   rtol=1e-9)


def test_max_grad_norm_clips_outer_updates():
    cfg, d, i0, t0, it, tt = tiny_setup()
    cfg2 = cfg.replace(max_grad_norm=1e-8, lr_img=10.0, lr_txt=10.0)
    d2 = Distiller(cfg2, d.model,
                   {"params": {
                       "image_encoder": d._unravel_img(jnp.asarray(i0)),
                       "text_projection": d._unravel_txt(jnp.asarray(t0))}},
                   np.asarray(d.state.image_syn),
                   np.asarray(d.state.text_syn))
    before = np.asarray(d2.state.image_syn).copy()
    idx = d2.sample_indices(np.random.RandomState(0))
    d2.step(i0, t0, it, tt, idx)
    after = np.asarray(d2.state.image_syn)
    # with a vanishing clip norm the update is ~lr * 1e-8: essentially zero
    assert np.max(np.abs(after - before)) < 1e-5


@pytest.mark.parametrize("mode", ["image_only", "text_only"])
def test_single_modality_distillation(mode):
    """--image_only/--text_only freeze the other modality's data + LR."""
    cfg, d, i0, t0, it, tt = tiny_setup()
    cfg2 = cfg.replace(**{mode: True})
    d2 = Distiller(cfg2, d.model,
                   {"params": {
                       "image_encoder": d._unravel_img(jnp.asarray(i0)),
                       "text_projection": d._unravel_txt(jnp.asarray(t0))}},
                   np.asarray(d.state.image_syn),
                   np.asarray(d.state.text_syn))
    img_before = np.asarray(d2.state.image_syn).copy()
    txt_before = np.asarray(d2.state.text_syn).copy()
    d2.step(i0, t0, it, tt, d2.sample_indices(np.random.RandomState(0)))
    img_moved = not np.allclose(np.asarray(d2.state.image_syn), img_before)
    txt_moved = not np.allclose(np.asarray(d2.state.text_syn), txt_before)
    if mode == "image_only":
        assert img_moved and not txt_moved
        np.testing.assert_allclose(float(d2.state.syn_lr_txt),
                                   cfg.lr_teacher_txt, rtol=1e-6)
    else:
        assert txt_moved and not img_moved
        np.testing.assert_allclose(float(d2.state.syn_lr_img),
                                   cfg.lr_teacher_img, rtol=1e-6)




def _tiny_setup_hvp(hvp_mode, inner_scale, dtype=np.float64,
                    carry_mode="flat", **cfg_kw):
    cfg = Config(
        image_encoder="convnet_tiny", image_size=16,
        num_queries=8, syn_steps=3, mini_batch_size=4,
        lr_img=10.0, lr_txt=10.0, lr_lr=1e-2,
        lr_teacher_img=0.05, lr_teacher_txt=0.05,
        inner_scale=inner_scale, inner_dtype="float64",
        hvp_mode=hvp_mode, carry_mode=carry_mode, seed=0, **cfg_kw)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    variables = jax.tree_util.tree_map(lambda x: x.astype(dtype), variables)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(8, 16, 16, 3).astype(dtype)
    text_syn = rng.randn(8, 768).astype(dtype)
    d = Distiller(cfg, model, variables, image_syn, text_syn)
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0 = np.asarray(txt_flat)
    it = (i0 + 0.01 * rng.randn(*i0.shape)).astype(dtype)
    tt = (t0 + 0.01 * rng.randn(*t0.shape)).astype(dtype)
    return cfg, d, i0, t0, it, tt


@pytest.mark.parametrize("inner_scale", ["fixed", "syn_lr"])
def test_hvp_forward_matches_reverse(inner_scale):
    """hvp_mode="forward" (custom VJP, reverse-over-forward Hessian) must
    produce THE SAME meta-gradients as the JAX-default reverse-over-
    reverse path — same math, different evaluation order.  float64 so
    agreement to ~1e-10 is expected, dropout active (rng keys saved as
    custom-VJP residuals must replay identically)."""
    with jax.enable_x64():
        grads = {}
        for mode in ("reverse", "forward"):
            cfg, d, i0, t0, it, tt = _tiny_setup_hvp(mode, inner_scale)
            idx = jnp.asarray(d.sample_indices(np.random.RandomState(1)))
            keys = jax.random.split(jax.random.PRNGKey(7), cfg.syn_steps)
            loss_f = lambda *a: d.grand_loss(*a)[0]
            g = jax.grad(loss_f, argnums=(0, 1, 2, 3))(
                d.state.image_syn, d.state.text_syn,
                d.state.syn_lr_img, d.state.syn_lr_txt,
                jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it),
                jnp.asarray(tt), idx, keys)
            grads[mode] = [np.asarray(x) for x in g]
        for a, b, name in zip(grads["reverse"], grads["forward"],
                              ("pixels", "texts", "lr_img", "lr_txt")):
            np.testing.assert_allclose(
                a, b, rtol=1e-9, atol=1e-12,
                err_msg=f"{name} grad mismatch (inner_scale={inner_scale})")


@pytest.mark.parametrize("inner_scale", ["fixed", "syn_lr"])
def test_fr_bwd_for_matches_rof(inner_scale):
    """fr_bwd="for" (jvp-through-grad, forward-over-reverse) must produce
    THE SAME meta-gradients as the default "rof" (grad-of-jvp) — the two
    orientations of the same second derivative (symmetry of mixed
    partials).  float64, dropout active."""
    with jax.enable_x64():
        grads = {}
        for mode in ("rof", "for"):
            cfg, d, i0, t0, it, tt = _tiny_setup_hvp(
                "forward", inner_scale, fr_bwd=mode)
            idx = jnp.asarray(d.sample_indices(np.random.RandomState(1)))
            keys = jax.random.split(jax.random.PRNGKey(7), cfg.syn_steps)
            loss_f = lambda *a: d.grand_loss(*a)[0]
            g = jax.grad(loss_f, argnums=(0, 1, 2, 3))(
                d.state.image_syn, d.state.text_syn,
                d.state.syn_lr_img, d.state.syn_lr_txt,
                jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it),
                jnp.asarray(tt), idx, keys)
            grads[mode] = [np.asarray(x) for x in g]
        for a, b, name in zip(grads["rof"], grads["for"],
                              ("pixels", "texts", "lr_img", "lr_txt")):
            np.testing.assert_allclose(
                a, b, rtol=1e-9, atol=1e-12,
                err_msg=f"{name} grad mismatch (inner_scale={inner_scale})")


@pytest.mark.parametrize("hvp_mode", ["reverse", "forward"])
def test_carry_tree_matches_flat(hvp_mode):
    """carry_mode="tree" (param-pytree scan carry) must produce THE SAME
    meta-gradients as the default flat-vector carry — the unravel point
    moves, the math does not.  float64, both hvp modes, dropout on."""
    with jax.enable_x64():
        grads = {}
        for carry in ("flat", "tree"):
            cfg, d, i0, t0, it, tt = _tiny_setup_hvp(
                hvp_mode, "fixed", carry_mode=carry)
            idx = jnp.asarray(d.sample_indices(np.random.RandomState(1)))
            keys = jax.random.split(jax.random.PRNGKey(7), cfg.syn_steps)
            loss_f = lambda *a: d.grand_loss(*a)[0]
            g = jax.grad(loss_f, argnums=(0, 1, 2, 3))(
                d.state.image_syn, d.state.text_syn,
                d.state.syn_lr_img, d.state.syn_lr_txt,
                jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it),
                jnp.asarray(tt), idx, keys)
            grads[carry] = [np.asarray(x) for x in g]
        for a, b, name in zip(grads["flat"], grads["tree"],
                              ("pixels", "texts", "lr_img", "lr_txt")):
            np.testing.assert_allclose(
                a, b, rtol=1e-9, atol=1e-12,
                err_msg=f"{name} grad mismatch (hvp_mode={hvp_mode})")


@pytest.mark.parametrize("inner_scale", ["fixed", "syn_lr"])
def test_hvp_forward_finite_difference(inner_scale):
    """Independent ground truth for the custom VJP: float64 FD on the
    learnable inner LRs through the forward-HVP unroll."""
    with jax.enable_x64():
        cfg, d, i0, t0, it, tt = _tiny_setup_hvp("forward", inner_scale)
        idx = jnp.asarray(d.sample_indices(np.random.RandomState(1)))
        keys = jax.random.split(jax.random.PRNGKey(7), cfg.syn_steps)
        args = (d.state.image_syn, d.state.text_syn,
                d.state.syn_lr_img, d.state.syn_lr_txt,
                jnp.asarray(i0), jnp.asarray(t0), jnp.asarray(it),
                jnp.asarray(tt), idx, keys)
        loss_f = lambda *a: d.grand_loss(*a)[0]
        grads = jax.grad(loss_f, argnums=(2, 3))(*args)
        eps = 1e-6
        for j, (k, name) in enumerate(((2, "lr_img"), (3, "lr_txt"))):
            a = list(args[:4])
            a[k] = args[k] + eps
            up = float(loss_f(*a, *args[4:]))
            a[k] = args[k] - eps
            down = float(loss_f(*a, *args[4:]))
            fd = (up - down) / (2 * eps)
            an = float(grads[j])
            assert np.isfinite(fd) and np.isfinite(an)
            assert abs(fd - an) < 1e-4 * max(1.0, abs(fd)), (name, fd, an)


def test_cycler_prefetch_matches_sync(tmp_path):
    """--traj_prefetch: the one-step-lookahead device transfer must be
    invisible — identical trajectories/starts vs the synchronous path,
    and HBM budget (cache + in-flight) bounded by traj_cache_cap."""
    import os

    from multimodal_dataset_distillation_tpu.engine.buffer_io import (
        save_expert,
    )
    from multimodal_dataset_distillation_tpu.engine.distill import (
        ExpertCycler,
    )

    rng = np.random.RandomState(0)
    bdir = str(tmp_path / "buffers")
    for _ in range(5):  # 5 single-expert files > cap=2: rotation misses
        traj = [{"w": rng.randn(4).astype(np.float32)} for _ in range(3)]
        ttraj = [{"w": rng.randn(2).astype(np.float32)} for _ in range(3)]
        save_expert(bdir, traj, ttraj, write_pt=False)
    files = sorted(os.listdir(bdir))
    img_files = [os.path.join(bdir, f) for f in files if f.startswith("img")]
    txt_files = [os.path.join(bdir, f) for f in files if f.startswith("txt")]

    kw = dict(max_start_epoch=2, expert_epochs=1, seed=0,
              device_cache_cap=2)
    sync = ExpertCycler(img_files, txt_files, prefetch=False, **kw)
    pre = ExpertCycler(img_files, txt_files, prefetch=True, **kw)
    assert pre._prefetch_pool is not None

    for i in range(13):  # > 2 full rotations incl. the wraparound shuffle
        si, st, ss = sync.next_segment_device()
        pi, pt, ps = pre.next_segment_device()
        assert ss == ps, i
        np.testing.assert_array_equal(np.asarray(si), np.asarray(pi))
        np.testing.assert_array_equal(np.asarray(st), np.asarray(pt))
        assert (len(pre._device_cache) + len(pre._pending)) <= 2, i


def test_cycler_prefetch_disabled_below_cap_two(tmp_path):
    """cap<2 cannot hold current+incoming: prefetch must self-disable."""
    import os

    from multimodal_dataset_distillation_tpu.engine.buffer_io import (
        save_expert,
    )
    from multimodal_dataset_distillation_tpu.engine.distill import (
        ExpertCycler,
    )

    rng = np.random.RandomState(0)
    bdir = str(tmp_path / "buffers")
    for _ in range(2):
        traj = [{"w": rng.randn(4).astype(np.float32)} for _ in range(3)]
        ttraj = [{"w": rng.randn(2).astype(np.float32)} for _ in range(3)]
        save_expert(bdir, traj, ttraj, write_pt=False)
    files = sorted(os.listdir(bdir))
    img_files = [os.path.join(bdir, f) for f in files if f.startswith("img")]
    txt_files = [os.path.join(bdir, f) for f in files if f.startswith("txt")]

    cyc = ExpertCycler(img_files, txt_files, max_start_epoch=2,
                       expert_epochs=1, seed=0, device_cache_cap=1,
                       prefetch=True)
    assert cyc._prefetch_pool is None
    cyc.next_segment_device()  # still serves
    assert not cyc._pending
