"""Expert-parallel trainer: K vmapped experts == K sequential experts
(SURVEY.md §2.6 row EP), incl. under an 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.engine.expert import (
    BiEncoderTrainer,
    ParallelExpertTrainer,
    init_bi_encoder,
)
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder


def _setup(k=2, mesh=None):
    cfg = Config(image_encoder="convnet_tiny", image_size=16, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    var_list = [init_bi_encoder(model, cfg.replace(seed=j)) for j in range(k)]
    rng = np.random.RandomState(0)
    images = rng.randn(k, 3, 4, 16, 16, 3).astype(np.float32)  # k x steps x B
    texts = rng.randn(k, 3, 4, 768).astype(np.float32)
    return model, var_list, images, texts


def test_parallel_matches_sequential():
    """Same inits + same batches + same dropout rngs -> same params."""
    model, var_list, images, texts = _setup(k=2)
    par = ParallelExpertTrainer(model, var_list, lr_img=0.05, lr_txt=0.05,
                                momentum=0.5, weight_decay=1e-4, seed=0)
    # record the per-expert rngs the parallel trainer will use per batch
    rng = par.rng
    batch_rngs = []
    for _ in range(images.shape[1]):
        rng, sub = jax.random.split(rng)
        batch_rngs.append(jax.random.split(sub, 2))
    for s in range(images.shape[1]):
        par.train_batch(images[:, s], texts[:, s])

    for j in range(2):
        seq = BiEncoderTrainer(model, var_list[j], lr_img=0.05, lr_txt=0.05,
                               momentum=0.5, weight_decay=1e-4, seed=0)
        for s in range(images.shape[1]):
            # drive the jitted step directly with the matched dropout rng
            (seq.variables, seq.opt_img, seq.opt_txt, _, _) = seq._step(
                seq.variables, seq.opt_img, seq.opt_txt,
                jnp.asarray(images[j, s]), jnp.asarray(texts[j, s]),
                batch_rngs[s][j], seq.lr_img, seq.lr_txt)
        a = jax.tree_util.tree_leaves(par.variables_for(j)["params"])
        b = jax.tree_util.tree_leaves(seq.variables["params"])
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-4, atol=2e-5)


def test_parallel_under_mesh():
    from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh

    mesh = get_mesh((8,), ("data",))
    model, var_list, images, texts = _setup(k=8)
    with mesh:
        par = ParallelExpertTrainer(model, var_list, lr_img=0.05,
                                    lr_txt=0.05, seed=0, mesh=mesh)
        loss, acc = par.train_batch(images[:, 0], texts[:, 0])
    assert loss.shape == (8,)
    assert np.isfinite(loss).all()
    # experts had different inits -> different losses
    assert len(np.unique(np.round(loss, 6))) > 1


def test_snapshots_are_per_expert():
    model, var_list, images, texts = _setup(k=2)
    par = ParallelExpertTrainer(model, var_list, lr_img=0.05, lr_txt=0.05,
                                seed=0)
    s0 = par.snapshot_image_params(0)
    s1 = par.snapshot_image_params(1)
    l0 = jax.tree_util.tree_leaves(s0)
    l1 = jax.tree_util.tree_leaves(s1)
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))


def test_trainable_text_expert_mode():
    """--text_trainable (buffer.py:49-50): txt optimizer + snapshots cover
    the full BERT tower; projection stays frozen at init."""
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.engine.expert import (
        TrainableTextTrainer,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoderTrainableText,
    )

    model = VLBiEncoderTrainableText(image_encoder_name="convnet_tiny",
                                     image_embedding=64, bert_variant="tiny")
    rng = jax.random.PRNGKey(0)
    imgs = jnp.zeros((2, 16, 16, 3), jnp.float32)
    ids = jnp.zeros((2, 16), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, imgs, ids,
                           jnp.ones_like(ids))
    proj_before = jax.tree_util.tree_map(
        np.asarray, variables["params"]["text_projection"])
    bert_before = jax.tree_util.tree_map(
        np.asarray, variables["params"]["text_encoder"])

    t = TrainableTextTrainer(model, variables, lr_img=0.05, lr_txt=0.01,
                             seed=0)
    r = np.random.RandomState(0)
    for _ in range(2):
        loss, acc = t.train_batch(
            r.randn(4, 16, 16, 3).astype(np.float32),
            r.randint(1, 100, (4, 16)).astype(np.int32),
            np.ones((4, 16), np.int32))
    assert np.isfinite(loss)

    proj_after = t.variables["params"]["text_projection"]
    bert_after = t.variables["params"]["text_encoder"]
    # projection frozen, BERT moved
    for a, b in zip(jax.tree_util.tree_leaves(proj_before),
                    jax.tree_util.tree_leaves(proj_after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    moved = any(not np.allclose(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(bert_before),
                                jax.tree_util.tree_leaves(bert_after)))
    assert moved
    # snapshot is the BERT tower
    snap = t.snapshot_text_params()
    assert set(snap.keys()) == set(bert_after.keys())


def test_bf16_expert_training_tracks_f32():
    """--train_dtype bfloat16 (fork AMP analog): finite, tracks f32."""
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.expert import (
        BiEncoderTrainer,
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoder,
    )

    cfg = Config(image_encoder="convnet_tiny", image_size=16, seed=0)
    model = VLBiEncoder(image_encoder_name="convnet_tiny",
                        text_embedding=768, image_embedding=64)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    images = rng.randn(8, 16, 16, 3).astype(np.float32)
    texts = rng.randn(8, 768).astype(np.float32)

    a = BiEncoderTrainer(model, variables, lr_img=0.05, lr_txt=0.05, seed=0)
    b = BiEncoderTrainer(model, variables, lr_img=0.05, lr_txt=0.05, seed=0,
                         compute_dtype="bfloat16")
    la, _ = a.train_batch(images, texts)
    lb, _ = b.train_batch(images, texts)
    assert np.isfinite(float(lb))
    assert abs(float(la) - float(lb)) / max(abs(float(la)), 1e-6) < 0.05
    # master params stay f32
    leaves = jax.tree_util.tree_leaves(b.variables["params"])
    assert all(np.asarray(x).dtype == np.float32 for x in leaves)


def test_trainable_text_reset_matches_fresh():
    """ROCO expert-loop trainer reuse (cli/buffer.py): reset() must
    reproduce a freshly-constructed TrainableTextTrainer bit-exactly —
    same variables, zeroed optimizer traces, same RNG chain."""
    from multimodal_dataset_distillation_tpu.engine.expert import (
        TrainableTextTrainer,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoderTrainableText,
    )

    model = VLBiEncoderTrainableText(image_encoder_name="convnet_tiny",
                                     image_embedding=64, bert_variant="tiny")
    rng = jax.random.PRNGKey(3)
    imgs = jnp.zeros((2, 16, 16, 3), jnp.float32)
    ids = jnp.zeros((2, 16), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, imgs, ids,
                           jnp.ones_like(ids))

    r = np.random.RandomState(1)
    batches = [(r.randn(4, 16, 16, 3).astype(np.float32),
                r.randint(1, 100, (4, 16)).astype(np.int32),
                np.ones((4, 16), np.int32)) for _ in range(2)]

    fresh = TrainableTextTrainer(model, variables, lr_img=0.05, lr_txt=0.01,
                                 momentum=0.9, weight_decay=5e-4, seed=7)
    for b in batches:
        fresh.train_batch(*b)

    reused = TrainableTextTrainer(model, variables, lr_img=0.05, lr_txt=0.01,
                                  momentum=0.9, weight_decay=5e-4, seed=0)
    reused.train_batch(*batches[0])  # dirty the state (expert 0)
    reused.reset(variables, seed=7)  # re-arm as expert 1
    for b in batches:
        reused.train_batch(*b)

    for a, b in zip(jax.tree_util.tree_leaves(fresh.variables),
                    jax.tree_util.tree_leaves(reused.variables)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
