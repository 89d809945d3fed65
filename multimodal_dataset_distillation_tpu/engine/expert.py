"""Expert-trajectory training engine (reference ``buffer.py`` + ``epoch``).

One jitted train step over the device mesh: batch sharded on the ``data``
axis, parameters replicated, gradients ``psum``-reduced by XLA (the
TPU-native replacement for ``torch.nn.DataParallel``, ``buffer.py:51-53``).
Two SGD optimizers — image tower and text projection — exactly as the
reference steps them per batch (``epoch_original.py:53-57``,
``buffer.py:59-60``: SGD(lr, momentum=mom, weight_decay=l2), with torch
semantics: decay added to the gradient *before* the momentum trace).

The frozen text encoder runs outside the step: captions are looked up in
the precomputed embedding cache (identical outputs — the tower is frozen
— without re-running BERT every batch like the reference does).

Per-epoch parameter snapshots land on host as numpy pytrees in the
canonical order used by the distiller and the buffer codec
(``buffer.py:67-68,94-95``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder


def torch_sgd(lr: float, momentum: float = 0.0,
              weight_decay: float = 0.0) -> optax.GradientTransformation:
    """SGD with torch's update order: g += wd*p, then momentum trace."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


class BiEncoderTrainer:
    """Holds variables + two optimizer states; exposes jitted train steps."""

    def __init__(self, model: VLBiEncoder, variables: Dict, *,
                 lr_img: float, lr_txt: float, momentum: float = 0.0,
                 weight_decay: float = 0.0, seed: int = 0, mesh=None,
                 compute_dtype: str = "float32",
                 device_augment: bool = False):
        self.model = model
        self.mesh = mesh  # data-parallel batch sharding (DataParallel)
        # "bfloat16" = the fork's AMP epoch (epoch.py:59-98) on TPU:
        # params/inputs cast in-graph, gradients accumulate f32
        self.compute_dtype = compute_dtype
        # --device_augment: images arrive as raw [0,255] crops and
        # RandAugment(2,5) + CLIP normalization run inside the step
        self.device_augment = device_augment
        self.variables = dict(variables)
        # lr is a TRACED step argument, not a compile-time constant:
        # eval blocks re-create trainers at the evolving learned lr_net
        # every eval_it iterations, and baking lr into the program forced
        # a full recompile (minutes on remote-compile hosts) plus a fresh
        # device-loaded executable per block (observed HBM accumulation
        # -> RESOURCE_EXHAUSTED after ~4 blocks on v5e-16GB).  momentum/
        # weight_decay stay static (they are fixed per trainer kind).
        self.lr_img = float(lr_img)
        self.lr_txt = float(lr_txt)
        self.momentum = momentum
        self.weight_decay = weight_decay
        # init-only transformation: opt-state STRUCTURE is lr-independent
        _tx = torch_sgd(0.0, momentum, weight_decay)
        params = self.variables["params"]
        self.opt_img = _tx.init(params["image_encoder"])
        self.opt_txt = _tx.init(params["text_projection"])
        self.rng = jax.random.PRNGKey(seed)
        self._step = self._build_step()

    def reset(self, variables: Dict, *, seed: int,
              lr_img=None, lr_txt=None):
        """Re-arm with a fresh init/seed/LR WITHOUT rebuilding the jitted
        step (lr is traced) — synset-eval blocks reuse one trainer and
        its compiled program across the run (see evaluate_synset)."""
        if lr_img is not None:
            self.lr_img = float(lr_img)
        if lr_txt is not None:
            self.lr_txt = float(lr_txt)
        self.variables = dict(variables)
        _tx = torch_sgd(0.0, self.momentum, self.weight_decay)
        params = self.variables["params"]
        self.opt_img = _tx.init(params["image_encoder"])
        self.opt_txt = _tx.init(params["text_projection"])
        self.rng = jax.random.PRNGKey(seed)

    def reset_optimizers(self, lr_img: float, lr_txt: float,
                         momentum: float = 0.0, weight_decay: float = 0.0):
        """Fresh SGD at new LR (the reference's step-decay recreates the
        optimizers, buffer.py:97-102 / epoch_original.py:190-192)."""
        self.lr_img = float(lr_img)
        self.lr_txt = float(lr_txt)
        params = self.variables["params"]
        _tx = torch_sgd(0.0, momentum, weight_decay)
        self.opt_img = _tx.init(params["image_encoder"])
        self.opt_txt = _tx.init(params["text_projection"])
        if (momentum, weight_decay) != (self.momentum, self.weight_decay):
            # static hypers changed: the program must be rebuilt
            self.momentum, self.weight_decay = momentum, weight_decay
            self._step = self._build_step()

    def _build_step(self):
        model = self.model
        momentum, weight_decay = self.momentum, self.weight_decay
        mesh = self.mesh
        cdt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        device_augment = self.device_augment

        @jax.jit
        def step(variables, opt_img, opt_txt, images, text_feats, rng,
                 lr_img, lr_txt):
            tx_img = torch_sgd(lr_img, momentum, weight_decay)
            tx_txt = torch_sgd(lr_txt, momentum, weight_decay)
            if mesh is not None and "data" in mesh.axis_names:
                from jax.sharding import NamedSharding, PartitionSpec as P

                images = jax.lax.with_sharding_constraint(
                    images, NamedSharding(
                        mesh, P("data", *([None] * (images.ndim - 1)))))
                text_feats = jax.lax.with_sharding_constraint(
                    text_feats, NamedSharding(mesh, P("data", None)))
            if device_augment:
                from multimodal_dataset_distillation_tpu.data.transforms import (
                    CLIP_MEAN,
                    CLIP_STD,
                )
                from multimodal_dataset_distillation_tpu.ops.randaugment_device import (
                    random_augment_device,
                )

                rng, ka = jax.random.split(rng)
                images = random_augment_device(images, ka)
                images = ((images / 255.0 - jnp.asarray(CLIP_MEAN))
                          / jnp.asarray(CLIP_STD))
            if cdt is not None:
                images = images.astype(cdt)
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                if cdt is not None:
                    # mixed precision: cast inside the graph so grads
                    # w.r.t. the f32 master params flow through the cast
                    p = jax.tree_util.tree_map(
                        lambda x: x.astype(cdt)
                        if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
                vs = {"params": p, **state}
                if state:
                    (loss, acc), new_state = model.apply(
                        vs, images, text_feats, train=True,
                        rngs={"dropout": rng}, mutable=list(state.keys()))
                else:
                    loss, acc = model.apply(vs, images, text_feats,
                                            train=True,
                                            rngs={"dropout": rng})
                    new_state = {}
                return loss, (acc, new_state)

            (loss, (acc, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd_i, opt_img = tx_img.update(grads["image_encoder"], opt_img,
                                           params["image_encoder"])
            upd_t, opt_txt = tx_txt.update(grads["text_projection"], opt_txt,
                                           params["text_projection"])
            new_params = dict(params)
            new_params["image_encoder"] = optax.apply_updates(
                params["image_encoder"], upd_i)
            new_params["text_projection"] = optax.apply_updates(
                params["text_projection"], upd_t)
            new_vars = {"params": new_params, **new_state}
            return new_vars, opt_img, opt_txt, loss, acc

        return step

    def train_batch(self, images: np.ndarray, text_feats: np.ndarray
                    ) -> Tuple[float, float]:
        self.rng, sub = jax.random.split(self.rng)
        if self.mesh is not None and jax.process_count() > 1:
            # multi-host: each process feeds its local shard of the global
            # batch (Loader shard=(pid, nproc)); assemble global arrays
            # sharded over the mesh data axis before entering jit
            from multimodal_dataset_distillation_tpu.parallel.mesh import (
                host_local_to_global,
            )

            images, text_feats = host_local_to_global(
                self.mesh, (np.asarray(images), np.asarray(text_feats)))
        else:
            images = jnp.asarray(images)
            text_feats = jnp.asarray(text_feats)
        (self.variables, self.opt_img, self.opt_txt, loss, acc) = self._step(
            self.variables, self.opt_img, self.opt_txt,
            images, text_feats, sub, self.lr_img, self.lr_txt)
        return loss, acc

    def train_epoch_arrays(self, loader) -> Tuple[float, float]:
        """One epoch over an ArrayPairLoader (synthetic-set training);
        mirrors ``epoch`` (epoch_original.py:20-62) with distill=True."""
        per = []
        for images, texts in loader:
            loss, acc = self.train_batch(images, texts)
            per.append((loss, acc, len(images)))
        loss_avg = sum(float(l) * n for l, _, n in per)
        acc_avg = sum(float(a) for _, a, _ in per)
        num = sum(n for _, _, n in per)
        return loss_avg / max(num, 1), acc_avg / max(num, 1)

    def train_epoch_captions(self, loader, caption_to_embed: Callable
                             ) -> Tuple[float, float]:
        """One epoch over a caption dataset loader (expert phase);
        mirrors ``epoch`` (epoch_original.py:20-62) with distill=False."""
        # defer device->host scalar reads to epoch end: a float() per
        # batch would stall dispatch for a full host round-trip each
        # step (pipelined-loop rule, same as cli/distill.py drain())
        per = []
        for batch in loader:
            images, captions = batch[0], batch[1]
            text_feats = caption_to_embed(captions)
            loss, acc = self.train_batch(images, text_feats)
            per.append((loss, acc, len(images)))
        loss_avg = sum(float(l) * n for l, _, n in per)
        acc_avg = sum(float(a) for _, a, _ in per)
        num = sum(n for _, _, n in per)
        return loss_avg / max(num, 1), acc_avg / max(num, 1)

    # ---- parameter snapshots (buffer.py:67-68,94-95) ----

    def snapshot_image_params(self):
        return jax.tree_util.tree_map(np.asarray,
                                      self.variables["params"]["image_encoder"])

    def snapshot_text_params(self):
        return jax.tree_util.tree_map(np.asarray,
                                      self.variables["params"]["text_projection"])


def init_bi_encoder(model: VLBiEncoder, cfg: Config,
                    rng: Optional[jax.Array] = None) -> Dict:
    """Initialize variables with the right input shapes."""
    rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
    imgs = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    txts = jnp.zeros((2, model.text_embedding), jnp.float32)
    return model.init({"params": rng, "dropout": rng}, imgs, txts)


class ParallelExpertTrainer:
    """Train K independent experts simultaneously (expert-parallel).

    The reference trains experts strictly sequentially (``buffer.py:42``),
    even though they are embarrassingly independent (SURVEY.md §2.6 row
    EP).  TPU-natively the expert axis is just another batch dimension:
    parameters, optimizer traces, and batches all carry a leading K, the
    per-expert step is ``jax.vmap``'d into one XLA program, and on a
    device mesh the K axis shards over ``data`` so each device trains its
    own expert(s) with zero cross-device traffic.

    Semantics match K sequential :class:`BiEncoderTrainer` runs when each
    expert is fed its own batch stream (same inits, same batch order).
    """

    def __init__(self, model: VLBiEncoder, variables_list: List[Dict], *,
                 lr_img: float, lr_txt: float, momentum: float = 0.0,
                 weight_decay: float = 0.0, seed: int = 0, mesh=None,
                 seeds: Optional[Sequence[int]] = None):
        self.model = model
        self.k = len(variables_list)
        self.mesh = mesh
        # lr is a traced step argument (see BiEncoderTrainer.__init__:
        # eval blocks rebuild this trainer at the evolving learned
        # lr_net; a baked-in lr forced a full recompile per eval block)
        self.lr_img = float(lr_img)
        self.lr_txt = float(lr_txt)
        self.momentum = momentum
        self.weight_decay = weight_decay
        self._tx_init = torch_sgd(0.0, momentum, weight_decay).init
        self.reset(variables_list, seeds=seeds, seed=seed,
                   lr_img=lr_img, lr_txt=lr_txt)
        self._step = self._build_step()

    def reset(self, variables_list, *, seeds=None, seed: int = 0,
              lr_img=None, lr_txt=None):
        """Re-arm with fresh inits/LR WITHOUT rebuilding the jitted step —
        eval blocks reuse one trainer (and its compiled program) across
        the whole run instead of recompiling every ``eval_it`` iterations.
        Reproduces a freshly-constructed trainer exactly: stacked
        variables, zero optimizer traces, per-expert RNG chains."""
        assert len(variables_list) == self.k, (len(variables_list), self.k)
        if lr_img is not None:
            self.lr_img = float(lr_img)
        if lr_txt is not None:
            self.lr_txt = float(lr_txt)
        self.variables = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *variables_list)
        params = self.variables["params"]
        self.opt_img = jax.vmap(self._tx_init)(params["image_encoder"])
        self.opt_txt = jax.vmap(self._tx_init)(params["text_projection"])
        # ``seeds``: one seed per expert -> each lane carries the SAME
        # key chain a sequential BiEncoderTrainer(seed=seeds[j]) would
        # (split once per batch, use the second half as the dropout key),
        # making vmapped results bit-comparable to K sequential runs.
        # Legacy ``seed``: one shared chain split K ways per batch.
        if seeds is not None:
            assert len(seeds) == self.k
            self.rngs = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
            self.rng = None
        else:
            self.rngs = None
            self.rng = jax.random.PRNGKey(seed)

    def _shard(self, tree):
        if self.mesh is None or "data" not in self.mesh.axis_names:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        def put(x):
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(put, tree)

    def _build_step(self):
        model = self.model
        momentum, weight_decay = self.momentum, self.weight_decay
        shard = self._shard

        def one(variables, opt_img, opt_txt, images, text_feats, rng,
                lr_img, lr_txt):
            tx_img = torch_sgd(lr_img, momentum, weight_decay)
            tx_txt = torch_sgd(lr_txt, momentum, weight_decay)
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(p):
                vs = {"params": p, **state}
                if state:
                    (loss, acc), new_state = model.apply(
                        vs, images, text_feats, train=True,
                        rngs={"dropout": rng}, mutable=list(state.keys()))
                else:
                    loss, acc = model.apply(vs, images, text_feats,
                                            train=True,
                                            rngs={"dropout": rng})
                    new_state = {}
                return loss, (acc, new_state)

            (loss, (acc, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            upd_i, opt_img = tx_img.update(grads["image_encoder"], opt_img,
                                           params["image_encoder"])
            upd_t, opt_txt = tx_txt.update(grads["text_projection"], opt_txt,
                                           params["text_projection"])
            new_params = dict(params)
            new_params["image_encoder"] = optax.apply_updates(
                params["image_encoder"], upd_i)
            new_params["text_projection"] = optax.apply_updates(
                params["text_projection"], upd_t)
            return {"params": new_params, **new_state}, opt_img, opt_txt, loss, acc

        @jax.jit
        def step(variables, opt_img, opt_txt, images, text_feats, rngs,
                 lr_img, lr_txt):
            variables = shard(variables)
            images = shard(images)
            text_feats = shard(text_feats)
            return jax.vmap(one, in_axes=(0, 0, 0, 0, 0, 0, None, None))(
                variables, opt_img, opt_txt, images, text_feats, rngs,
                lr_img, lr_txt)

        return step

    def train_batch(self, images: np.ndarray, text_feats: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
        """images: (K, B, H, W, C); text_feats: (K, B, D)."""
        if self.rngs is not None:
            # per-expert chains, bit-matching BiEncoderTrainer.train_batch
            pairs = jax.vmap(jax.random.split)(self.rngs)  # (K, 2, key)
            self.rngs = pairs[:, 0]
            rngs = pairs[:, 1]
        else:
            self.rng, sub = jax.random.split(self.rng)
            rngs = jax.random.split(sub, self.k)
        (self.variables, self.opt_img, self.opt_txt, loss, acc) = self._step(
            self.variables, self.opt_img, self.opt_txt,
            jnp.asarray(images), jnp.asarray(text_feats), rngs,
            self.lr_img, self.lr_txt)
        return loss, acc

    def train_epoch_captions(self, loaders, caption_to_embed: Callable
                             ) -> Tuple[np.ndarray, np.ndarray]:
        """One epoch: ``loaders`` is a list of K loaders (one batch stream
        per expert, preserving the reference's per-expert shuffling).
        Device->host reads deferred to epoch end (dispatch pipelining)."""
        per = []
        for batches in zip(*loaders):
            shapes = {np.shape(b[0])[0] for b in batches}
            if len(shapes) != 1:
                # all K loaders must agree on batch size at every step
                # (they do when built over the same dataset/batch_size;
                # a ragged mismatch would otherwise surface as an opaque
                # np.stack error).  NB a shared partial FINAL batch is
                # fine — it just costs one extra jit compile at that
                # shape, like the sequential path.
                raise ValueError(
                    f"parallel expert loaders disagree on batch size: "
                    f"{sorted(shapes)} — all {len(batches)} streams must "
                    f"yield identically-shaped batches each step")
            images = np.stack([b[0] for b in batches])
            texts = np.stack([caption_to_embed(b[1]) for b in batches])
            loss, acc = self.train_batch(images, texts)
            per.append((loss, acc, images.shape[1]))
        loss_sum = np.zeros(self.k)
        acc_sum = np.zeros(self.k)
        num = np.zeros(self.k)
        for loss, acc, n in per:
            loss_sum += np.asarray(loss) * n
            acc_sum += np.asarray(acc)
            num += n
        return loss_sum / np.maximum(num, 1), acc_sum / np.maximum(num, 1)

    # ---- per-expert views / snapshots ----

    def variables_for(self, k: int) -> Dict:
        return jax.tree_util.tree_map(lambda x: x[k], self.variables)

    def snapshot_image_params(self, k: int):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x[k]),
            self.variables["params"]["image_encoder"])

    def snapshot_text_params(self, k: int):
        return jax.tree_util.tree_map(
            lambda x: np.asarray(x[k]),
            self.variables["params"]["text_projection"])


class TrainableTextTrainer:
    """Expert trainer for ``--text_trainable`` (buffer.py:49-50): the txt
    optimizer covers the full BERT tower; the projection stays frozen at
    init (exactly the reference's optimizer-group split).  Inputs are
    tokenized on host and padded to a static length so the step jits once.
    """

    def __init__(self, model, variables: Dict, *, lr_img: float,
                 lr_txt: float, momentum: float = 0.0,
                 weight_decay: float = 0.0, seed: int = 0, mesh=None):
        self.model = model
        self.mesh = mesh
        self.variables = dict(variables)
        self.tx_img = torch_sgd(lr_img, momentum, weight_decay)
        self.tx_txt = torch_sgd(lr_txt, momentum, weight_decay)
        params = self.variables["params"]
        self.opt_img = self.tx_img.init(params["image_encoder"])
        self.opt_txt = self.tx_txt.init(params["text_encoder"])
        self.rng = jax.random.PRNGKey(seed)
        self._step = self._build_step()

    def reset(self, variables: Dict, *, seed: int):
        """Re-arm with a fresh init/seed WITHOUT rebuilding the jitted
        step — the ROCO expert loop (cli/buffer.py) trains num_experts
        teachers at the SAME constant hypers, so one compiled program
        serves the whole run (cf. BiEncoderTrainer.reset; on
        remote-compile hosts the rebuild was minutes per expert)."""
        self.variables = dict(variables)
        params = self.variables["params"]
        self.opt_img = self.tx_img.init(params["image_encoder"])
        self.opt_txt = self.tx_txt.init(params["text_encoder"])
        self.rng = jax.random.PRNGKey(seed)

    def _build_step(self):
        model, tx_img, tx_txt = self.model, self.tx_img, self.tx_txt

        @jax.jit
        def step(variables, opt_img, opt_txt, images, ids, mask, rng):
            params = variables["params"]
            state = {k: v for k, v in variables.items() if k != "params"}

            def loss_fn(img_p, txt_p):
                p = dict(params)
                p["image_encoder"] = img_p
                p["text_encoder"] = txt_p
                vs = {"params": p, **state}
                if state:
                    (loss, acc), new_state = model.apply(
                        vs, images, ids, mask, train=True,
                        rngs={"dropout": rng}, mutable=list(state.keys()))
                else:
                    loss, acc = model.apply(vs, images, ids, mask, train=True,
                                            rngs={"dropout": rng})
                    new_state = {}
                return loss, (acc, new_state)

            (loss, (acc, new_state)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    params["image_encoder"], params["text_encoder"])
            upd_i, opt_img = tx_img.update(grads[0], opt_img,
                                           params["image_encoder"])
            upd_t, opt_txt = tx_txt.update(grads[1], opt_txt,
                                           params["text_encoder"])
            new_params = dict(params)
            new_params["image_encoder"] = optax.apply_updates(
                params["image_encoder"], upd_i)
            new_params["text_encoder"] = optax.apply_updates(
                params["text_encoder"], upd_t)
            new_vars = {"params": new_params, **new_state}
            return new_vars, opt_img, opt_txt, loss, acc

        return step

    def train_batch(self, images: np.ndarray, input_ids: np.ndarray,
                    attention_mask: np.ndarray) -> Tuple[float, float]:
        self.rng, sub = jax.random.split(self.rng)
        (self.variables, self.opt_img, self.opt_txt, loss, acc) = self._step(
            self.variables, self.opt_img, self.opt_txt,
            jnp.asarray(images), jnp.asarray(input_ids),
            jnp.asarray(attention_mask), sub)
        return loss, acc

    def train_epoch_captions(self, loader, tokenize, pad_to: int = 64
                             ) -> Tuple[float, float]:
        """``tokenize(captions) -> (ids, mask)``; padded/truncated to a
        static ``pad_to`` so XLA never recompiles."""
        per = []
        for batch in loader:
            images, captions = batch[0], batch[1]
            ids, mask = tokenize(list(captions))
            out_i = np.zeros((len(captions), pad_to), np.int32)
            out_m = np.zeros((len(captions), pad_to), np.int32)
            n = min(ids.shape[1], pad_to)
            out_i[:, :n] = ids[:, :n]
            out_m[:, :n] = mask[:, :n]
            loss, acc = self.train_batch(images, out_i, out_m)
            per.append((loss, acc, len(images)))
        loss_avg = sum(float(l) * n for l, _, n in per)
        acc_avg = sum(float(a) for _, a, _ in per)
        num = sum(n for _, _, n in per)
        return loss_avg / max(num, 1), acc_avg / max(num, 1)

    def snapshot_image_params(self):
        return jax.tree_util.tree_map(
            np.asarray, self.variables["params"]["image_encoder"])

    def snapshot_text_params(self):
        """Snapshot the BERT tower (reference buffer.py:50,68 in
        text_trainable mode)."""
        return jax.tree_util.tree_map(
            np.asarray, self.variables["params"]["text_encoder"])
