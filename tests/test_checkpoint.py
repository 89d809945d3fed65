"""Mid-run distillation checkpoint/resume (new capability; the reference
loses everything on a crash — SURVEY.md §5.4)."""

import os

import jax
import numpy as np

from tests.test_distill import tiny_setup


def test_checkpoint_roundtrip_bit_identical(tmp_path):
    from multimodal_dataset_distillation_tpu.engine.checkpoint import (
        load_distill_checkpoint,
        save_distill_checkpoint,
    )

    cfg, d, i0, t0, it, tt = tiny_setup()
    host_rng = np.random.RandomState(7)

    # advance 2 steps, checkpoint, advance 1 more -> reference result
    for _ in range(2):
        d.step(i0, t0, it, tt, d.sample_indices(host_rng))
    path = str(tmp_path / "distill_ckpt_2.msgpack")
    save_distill_checkpoint(path, d, it=2, host_rng=host_rng)
    d.step(i0, t0, it, tt, d.sample_indices(host_rng))
    ref_state = jax.tree_util.tree_map(np.asarray, d.state)

    # fresh distiller + fresh rng, restore, replay the 3rd step
    cfg2, d2, *_ = tiny_setup()
    host_rng2 = np.random.RandomState(123)  # deliberately different
    resumed_it = load_distill_checkpoint(path, d2, host_rng=host_rng2)
    assert resumed_it == 2
    d2.step(i0, t0, it, tt, d2.sample_indices(host_rng2))
    new_state = jax.tree_util.tree_map(np.asarray, d2.state)

    np.testing.assert_array_equal(ref_state.image_syn, new_state.image_syn)
    np.testing.assert_array_equal(ref_state.text_syn, new_state.text_syn)
    np.testing.assert_array_equal(np.asarray(ref_state.syn_lr_img),
                                  np.asarray(new_state.syn_lr_img))
    # optimizer momentum traces restored too
    ref_mom = jax.tree_util.tree_leaves(ref_state.opt_img)
    new_mom = jax.tree_util.tree_leaves(new_state.opt_img)
    for a, b in zip(ref_mom, new_mom):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_restores_cycler(tmp_path):
    from multimodal_dataset_distillation_tpu.engine.buffer_io import (
        save_expert,
    )
    from multimodal_dataset_distillation_tpu.engine.checkpoint import (
        load_distill_checkpoint,
        save_distill_checkpoint,
    )
    from multimodal_dataset_distillation_tpu.engine.distill import (
        ExpertCycler,
    )

    rng = np.random.RandomState(0)
    bdir = str(tmp_path / "buffers")
    for _ in range(3):
        traj = [{"w": rng.randn(4).astype(np.float32)} for _ in range(3)]
        ttraj = [{"w": rng.randn(2).astype(np.float32)} for _ in range(3)]
        save_expert(bdir, traj, ttraj, write_pt=False)
    files = sorted(os.listdir(bdir))
    img_files = [os.path.join(bdir, f) for f in files if f.startswith("img")]
    txt_files = [os.path.join(bdir, f) for f in files if f.startswith("txt")]

    cyc = ExpertCycler(img_files, txt_files, max_start_epoch=2,
                       expert_epochs=1, seed=0)
    cfg, d, *_ = tiny_setup()
    for _ in range(2):
        cyc.next_segment()
    path = str(tmp_path / "ck.msgpack")
    save_distill_checkpoint(path, d, it=1, cycler=cyc)
    expected = [cyc.next_segment() for _ in range(3)]

    cyc2 = ExpertCycler(img_files, txt_files, max_start_epoch=2,
                        expert_epochs=1, seed=99)
    load_distill_checkpoint(path, d, cycler=cyc2)
    got = [cyc2.next_segment() for _ in range(3)]
    for (e, g) in zip(expected, got):
        np.testing.assert_array_equal(e[0], g[0])
        np.testing.assert_array_equal(e[2], g[2])
        assert e[4] == g[4]
