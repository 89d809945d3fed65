"""VLBiEncoder — the CLIP-style bi-encoder (CLIPModel_full equivalent).

Reference: ``networks.py:805-889``.  Structure:
* ``image_encoder``: any zoo tower (nfnet headless -> 2304-d, others 1000-d)
* ``text_projection``: :class:`ProjectionHead` (text_dim -> image_embedding)
* optional ``image_projection`` (only when ``only_has_image_projection``;
  the reference applies it iff the attribute exists, ``networks.py:868``)
* forward = symmetric InfoNCE with fixed scale ``exp(log(1/0.07))`` over
  l2-normalized embeddings, returning ``(loss, acc)``
  (``networks.py:877-888``).

The frozen text encoder is *not* a submodule: in distill mode (or whenever
the caption is already a tensor) the reference bypasses it
(``networks.py:861-864``), and in expert mode its outputs are
deterministic per caption — so this framework always feeds precomputed
text features (from :class:`~.bert.TextEncoder` caches), keeping the
jitted train step free of host round-trips.  The params tree splits
cleanly into ``image_encoder`` / ``text_projection`` subtrees — the exact
two parameter groups the reference optimizes and snapshots separately
(``buffer.py:59-60,67-68``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.models.projection import ProjectionHead
from multimodal_dataset_distillation_tpu.models.zoo import ImageTower, IMAGE_FEATURE_DIMS
from multimodal_dataset_distillation_tpu.ops.contrastive import (
    FIXED_LOGIT_SCALE,
    contrastive_loss_and_acc,
    l2_normalize,
)


class VLBiEncoder(nn.Module):
    image_encoder_name: str = "nfnet"
    text_embedding: int = 768
    image_embedding: int = 2304          # projection target (networks.py:810-826)
    only_image_projection: bool = False
    transfer: bool = False
    proj_dropout: float = 0.1            # ProjectionHead Dropout(0.1), networks.py:634

    def setup(self):
        self.image_encoder = ImageTower(self.image_encoder_name, self.transfer)
        self.text_projection = ProjectionHead(
            embedding_dim=self.text_embedding,
            projection_dim=self.image_embedding,
            dropout=self.proj_dropout)
        if self.only_image_projection:
            self.image_projection = ProjectionHead(
                embedding_dim=self.image_embedding,
                dropout=self.proj_dropout)

    def encode_image(self, images: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        feats = self.image_encoder(images, train=train)
        if self.only_image_projection:
            feats = self.image_projection(feats, deterministic=not train)
        return feats

    def project_text(self, text_features: jnp.ndarray, *,
                     train: bool = False) -> jnp.ndarray:
        return self.text_projection(text_features, deterministic=not train)

    def __call__(self, images: jnp.ndarray, text_features: jnp.ndarray, *,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        img = self.encode_image(images, train=train).astype(jnp.float32)
        txt = self.project_text(text_features.astype(jnp.float32), train=train)
        return contrastive_loss_and_acc(img, txt, FIXED_LOGIT_SCALE)


class VLBiEncoderTrainableText(nn.Module):
    """Bi-encoder with the text tower *inside* the train step.

    Reference ``--text_trainable`` mode (buffer.py:49-50): the txt
    optimizer covers the full BERT encoder instead of the projection —
    the projection stays frozen at init — and per-epoch snapshots record
    the BERT parameters.  Takes tokenized ``(input_ids, attention_mask)``
    so the whole step stays one jitted program (static padded length).
    """

    image_encoder_name: str = "nfnet"
    image_embedding: int = 2304
    bert_variant: str = "base"
    transfer: bool = False

    def setup(self):
        from multimodal_dataset_distillation_tpu.models.bert import (
            BERT_BASE,
            BERT_TINY,
            BertEncoder,
        )

        bert_cfg = BERT_BASE if self.bert_variant == "base" else BERT_TINY
        self.image_encoder = ImageTower(self.image_encoder_name, self.transfer)
        self.text_encoder = BertEncoder(bert_cfg)
        self.text_projection = ProjectionHead(
            embedding_dim=bert_cfg.hidden_size,
            projection_dim=self.image_embedding)

    def encode_image(self, images: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        return self.image_encoder(images, train=train)

    def encode_text(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray,
                    *, train: bool = False) -> jnp.ndarray:
        cls = self.text_encoder(input_ids, attention_mask)[:, 0, :]
        return self.text_projection(cls, deterministic=not train)

    def project_text(self, text_features: jnp.ndarray, *,
                     train: bool = False) -> jnp.ndarray:
        """Cached-embedding path for ``epoch_test`` (the reference scores
        with the precomputed CLS cache even in text_trainable mode)."""
        return self.text_projection(text_features, deterministic=not train)

    def __call__(self, images: jnp.ndarray, input_ids: jnp.ndarray,
                 attention_mask: jnp.ndarray, *,
                 train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        img = self.encode_image(images, train=train).astype(jnp.float32)
        txt = self.encode_text(input_ids, attention_mask, train=train)
        return contrastive_loss_and_acc(img, txt, FIXED_LOGIT_SCALE)


def build_bi_encoder(cfg: Config) -> VLBiEncoder:
    """Build from a :class:`Config` like ``CLIPModel_full(args, eval_stage)``.

    Dims come from the actual towers: the projection target must equal the
    image tower's feature dim for the contrastive dot product (in the
    reference the dim table at ``networks.py:810-819`` encodes exactly the
    feature dims of its timm towers).  Text dim follows the configured
    text encoder (768 for BERT-base, 128 for the offline tiny variant).
    """
    dim_key = ("nfnet_transfer" if (cfg.image_encoder == "nfnet"
                                    and cfg.transfer) else cfg.image_encoder)
    image_dim = IMAGE_FEATURE_DIMS.get(dim_key, cfg.image_embedding)
    text_dim = cfg.text_embedding
    if cfg.text_encoder_config == "tiny":
        if cfg.text_encoder == "bert":
            from multimodal_dataset_distillation_tpu.models.bert import BERT_TINY

            text_dim = BERT_TINY.hidden_size
        elif cfg.text_encoder == "clip":
            from multimodal_dataset_distillation_tpu.models.clip_text import (
                CLIP_TEXT_TINY,
            )

            text_dim = CLIP_TEXT_TINY.embed_dim
    return VLBiEncoder(
        image_encoder_name=cfg.image_encoder,
        text_embedding=text_dim,
        image_embedding=image_dim,
        only_image_projection=cfg.only_has_image_projection,
        transfer=cfg.transfer,
    )
