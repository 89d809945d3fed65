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
from typing import Any, Callable, Dict, List, Optional, Tuple

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
                 weight_decay: float = 0.0, seed: int = 0):
        self.model = model
        self.variables = dict(variables)
        self.tx_img = torch_sgd(lr_img, momentum, weight_decay)
        self.tx_txt = torch_sgd(lr_txt, momentum, weight_decay)
        params = self.variables["params"]
        self.opt_img = self.tx_img.init(params["image_encoder"])
        self.opt_txt = self.tx_txt.init(params["text_projection"])
        self.rng = jax.random.PRNGKey(seed)
        self._step = self._build_step()

    def reset_optimizers(self, lr_img: float, lr_txt: float,
                         momentum: float = 0.0, weight_decay: float = 0.0):
        """Fresh SGD at new LR (the reference's step-decay recreates the
        optimizers, buffer.py:97-102 / epoch_original.py:190-192)."""
        self.tx_img = torch_sgd(lr_img, momentum, weight_decay)
        self.tx_txt = torch_sgd(lr_txt, momentum, weight_decay)
        params = self.variables["params"]
        self.opt_img = self.tx_img.init(params["image_encoder"])
        self.opt_txt = self.tx_txt.init(params["text_projection"])
        self._step = self._build_step()

    def _build_step(self):
        model, tx_img, tx_txt = self.model, self.tx_img, self.tx_txt

        @jax.jit
        def step(variables, opt_img, opt_txt, images, text_feats, rng):
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
            new_vars = {"params": new_params, **new_state}
            return new_vars, opt_img, opt_txt, loss, acc

        return step

    def train_batch(self, images: np.ndarray, text_feats: np.ndarray
                    ) -> Tuple[float, float]:
        self.rng, sub = jax.random.split(self.rng)
        (self.variables, self.opt_img, self.opt_txt, loss, acc) = self._step(
            self.variables, self.opt_img, self.opt_txt,
            jnp.asarray(images), jnp.asarray(text_feats), sub)
        return loss, acc

    def train_epoch_arrays(self, loader) -> Tuple[float, float]:
        """One epoch over an ArrayPairLoader (synthetic-set training);
        mirrors ``epoch`` (epoch_original.py:20-62) with distill=True."""
        loss_avg = acc_avg = num = 0.0
        for images, texts in loader:
            loss, acc = self.train_batch(images, texts)
            n = len(images)
            loss_avg += float(loss) * n
            acc_avg += float(acc)
            num += n
        return loss_avg / max(num, 1), acc_avg / max(num, 1)

    def train_epoch_captions(self, loader, caption_to_embed: Callable
                             ) -> Tuple[float, float]:
        """One epoch over a caption dataset loader (expert phase);
        mirrors ``epoch`` (epoch_original.py:20-62) with distill=False."""
        loss_avg = acc_avg = num = 0.0
        for batch in loader:
            images, captions = batch[0], batch[1]
            text_feats = caption_to_embed(captions)
            loss, acc = self.train_batch(images, text_feats)
            n = len(images)
            loss_avg += float(loss) * n
            acc_avg += float(acc)
            num += n
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
