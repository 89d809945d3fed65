"""Multi-device (8 virtual CPU) data-parallel tests + graft entry checks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    shard_batch,
)


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_mesh_and_batch_sharding():
    mesh = get_mesh((8,), ("data",))
    x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)
    np.testing.assert_array_equal(np.asarray(xs), x)


def test_dp_train_step_matches_single_device():
    """Sharded expert train step == replicated step (DataParallel parity)."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.expert import (
        BiEncoderTrainer,
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder

    cfg = Config(image_encoder="convnet_tiny", image_size=16, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)

    rng = np.random.RandomState(0)
    images = rng.randn(16, 16, 16, 3).astype(np.float32)
    texts = rng.randn(16, 768).astype(np.float32)

    t1 = BiEncoderTrainer(model, variables, lr_img=0.1, lr_txt=0.1, seed=0)
    loss1, acc1 = t1.train_batch(images, texts)

    mesh = get_mesh((8,), ("data",))
    t2 = BiEncoderTrainer(model, variables, lr_img=0.1, lr_txt=0.1, seed=0)
    sharded = shard_batch(mesh, {"img": images, "txt": texts})
    loss2, acc2 = t2.train_batch(sharded["img"], sharded["txt"])

    assert abs(float(loss1) - float(loss2)) < 1e-5
    assert float(acc1) == float(acc2)
    # parameters after the step agree
    for a, b in zip(jax.tree_util.tree_leaves(t1.variables["params"]),
                    jax.tree_util.tree_leaves(t2.variables["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    # tiny-shape compile sanity is too slow for nfnet on CPU here; just
    # validate the callable signature contract on an abstract eval
    out = jax.eval_shape(fn, *args)
    assert len(out) == 2  # (loss, acc)


@pytest.mark.slow
def test_graft_entry_multichip():
    # Run in a SUBPROCESS: the flagship 8-device AOT compile is the
    # largest program XLA:CPU builds in this suite, and compiling it
    # inside the long-lived pytest process has segfaulted natively
    # (observed twice, once in backend_compile_and_load and once in the
    # compile-cache writer, only after ~130 prior tests — never when run
    # alone).  Process isolation keeps the coverage and removes the
    # flakiness.  MDD_DRYRUN_TIER=tiny skips the flagship execute +
    # exact-headline 224² compile (together ~20 min alone on the 1-core
    # host, well past any sane suite budget under xdist load) — those
    # paths are exercised by the driver's own dryrun_multichip run,
    # whose artifact (MULTICHIP_r*.json) is the record.
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    env.update({
        "PYTHONPATH": repo,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": flags,
        "MDD_DRYRUN_TIER": "tiny",
    })
    res = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as ge; ge.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=1800)
    assert res.returncode == 0, (
        f"dryrun_multichip(8) subprocess failed rc={res.returncode}\n"
        f"stdout:\n{res.stdout[-2000:]}\nstderr:\n{res.stderr[-2000:]}")


def test_bi_encoder_trainer_mesh_parity():
    """Expert train step under an 8-device data mesh == single-device."""
    import jax
    import numpy as np

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.expert import (
        BiEncoderTrainer,
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )
    from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh

    cfg = Config(image_encoder="convnet_tiny", image_size=16, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    images = rng.randn(16, 16, 16, 3).astype(np.float32)
    texts = rng.randn(16, 768).astype(np.float32)

    t1 = BiEncoderTrainer(model, variables, lr_img=0.05, lr_txt=0.05, seed=0)
    l1, a1 = t1.train_batch(images, texts)

    mesh = get_mesh((8,), ("data",))
    with mesh:
        t2 = BiEncoderTrainer(model, variables, lr_img=0.05, lr_txt=0.05,
                              seed=0, mesh=mesh)
        l2, a2 = t2.train_batch(images, texts)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    pa = jax.tree_util.tree_leaves(t1.variables["params"])
    pb = jax.tree_util.tree_leaves(t2.variables["params"])
    for x, y in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_shape_flag_parsing():
    from multimodal_dataset_distillation_tpu.config import parse_config

    cfg = parse_config(["--mesh_shape", "4,2", "--mesh_axes", "data,model"])
    assert cfg.mesh_shape == (4, 2)
    assert cfg.mesh_axes == ("data", "model")
    cfg = parse_config([])
    assert cfg.mesh_shape == ()
    assert cfg.mesh_axes == ("data",)
