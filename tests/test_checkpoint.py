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


def _mesh_setup(mesh, nq=10):
    """convnet_tiny distiller; nq=10 does not divide the 8-mesh -> pad 6."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    cfg = Config(image_encoder="convnet_tiny", image_size=16,
                 num_queries=nq, syn_steps=2, mini_batch_size=8,
                 lr_teacher_img=0.05, lr_teacher_txt=0.05, seed=0,
                 lr_img=100.0, lr_txt=100.0, lr_lr=1e-2, shard_syn=True)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    image_syn = rng.randn(nq, 16, 16, 3).astype(np.float32)
    text_syn = rng.randn(nq, 768).astype(np.float32)
    d = Distiller(cfg, model, variables, image_syn, text_syn, mesh=mesh)
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0 = np.asarray(txt_flat)
    it = i0 + 0.01 * rng.randn(*i0.shape).astype(np.float32)
    tt = t0 + 0.01 * rng.randn(*t0.shape).astype(np.float32)
    return d, (i0, t0, it, tt)


def test_checkpoint_padded_to_unpadded_resume(tmp_path):
    """A checkpoint written on an 8-device mesh (nq=10 -> 16 padded rows)
    resumes on no mesh with the pad rows STRIPPED, and the logical state
    is bit-identical (ADVICE r4: stale pad rows were silently carried)."""
    from multimodal_dataset_distillation_tpu.engine.checkpoint import (
        load_distill_checkpoint,
        save_distill_checkpoint,
    )
    from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh

    mesh = get_mesh((8,), ("data",))
    d_mesh, flats = _mesh_setup(mesh)
    host_rng = np.random.RandomState(7)
    for _ in range(2):
        d_mesh.step(*flats, d_mesh.sample_indices(host_rng))
    assert d_mesh._syn_pad == 6
    assert np.shape(d_mesh.state.image_syn)[0] == 16
    path = str(tmp_path / "ck.msgpack")
    save_distill_checkpoint(path, d_mesh, it=2, host_rng=host_rng)

    d_plain, _ = _mesh_setup(None)
    assert d_plain._syn_pad == 0
    assert load_distill_checkpoint(path, d_plain) == 2
    assert np.shape(d_plain.state.image_syn)[0] == 10
    img_m, txt_m = d_mesh.syn_arrays()
    img_p, txt_p = d_plain.syn_arrays()
    np.testing.assert_array_equal(img_m, img_p)
    np.testing.assert_array_equal(txt_m, txt_p)
    # momentum buffers repadded consistently: the resumed step runs and
    # matches the meshed continuation on the logical rows
    idx = d_plain.sample_indices(np.random.RandomState(3))
    m_p = d_plain.step(*flats, idx)
    m_m = d_mesh.step(*flats, idx)
    np.testing.assert_allclose(float(m_p["grand_loss"]),
                               float(m_m["grand_loss"]), rtol=2e-4)
    np.testing.assert_allclose(d_plain.syn_arrays()[0],
                               d_mesh.syn_arrays()[0], rtol=1e-3, atol=1e-5)


def test_checkpoint_unpadded_to_padded_resume(tmp_path):
    """The reverse: an unpadded checkpoint resumed onto the mesh re-pads
    (previously failed later with an opaque sharding error)."""
    from multimodal_dataset_distillation_tpu.engine.checkpoint import (
        load_distill_checkpoint,
        save_distill_checkpoint,
    )
    from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh

    d_plain, flats = _mesh_setup(None)
    host_rng = np.random.RandomState(7)
    d_plain.step(*flats, d_plain.sample_indices(host_rng))
    path = str(tmp_path / "ck.msgpack")
    save_distill_checkpoint(path, d_plain, it=1, host_rng=host_rng)

    mesh = get_mesh((8,), ("data",))
    d_mesh, _ = _mesh_setup(mesh)
    assert load_distill_checkpoint(path, d_mesh) == 1
    assert np.shape(d_mesh.state.image_syn)[0] == 16
    # pad rows are zero, sharding applied
    np.testing.assert_array_equal(
        np.asarray(d_mesh.state.image_syn)[10:], 0.0)
    assert tuple(d_mesh.state.image_syn.sharding.spec)[:1] == ("data",)
    np.testing.assert_array_equal(d_plain.syn_arrays()[0],
                                  d_mesh.syn_arrays()[0])
    idx = d_mesh.sample_indices(np.random.RandomState(3))
    m_m = d_mesh.step(*flats, idx)
    m_p = d_plain.step(*flats, idx)
    np.testing.assert_allclose(float(m_m["grand_loss"]),
                               float(m_p["grand_loss"]), rtol=2e-4)


def test_checkpoint_wrong_num_queries_raises(tmp_path):
    from multimodal_dataset_distillation_tpu.engine.checkpoint import (
        load_distill_checkpoint,
        save_distill_checkpoint,
    )

    d10, _ = _mesh_setup(None, nq=10)
    path = str(tmp_path / "ck.msgpack")
    save_distill_checkpoint(path, d10, it=0)
    d12, _ = _mesh_setup(None, nq=12)
    try:
        load_distill_checkpoint(path, d12)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "num_queries" in str(e)
