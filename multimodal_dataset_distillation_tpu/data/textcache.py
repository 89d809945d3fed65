"""Text-embedding precompute & cache (textprocess / textprocess_train).

Reference: ``data/__init__.py:153-191`` + ``utils.py:872-893``
(``load_or_process_file``): run the frozen text encoder over captions in
chunks and cache to ``{dataset}_{text_encoder}_text_embed.npz`` /
``{dataset}_{text_encoder}_train_text_embed.npz`` under key
``bert_test_embed``; compute-if-missing, then ``np.load``.

Filenames are kept identical for artifact interop.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.models.bert import TextEncoder


def make_text_encoder(cfg: Config):
    """bert -> BERT CLS tower; clip -> CLIP EOT tower (networks.py:693-737)."""
    if cfg.text_encoder == "bert":
        return TextEncoder(variant=cfg.text_encoder_config,
                           pretrained=cfg.text_pretrained, seed=cfg.seed)
    if cfg.text_encoder == "clip":
        from multimodal_dataset_distillation_tpu.models.clip_text import (
            ClipTextEncoder,
        )

        return ClipTextEncoder(variant=cfg.text_encoder_config,
                               pretrained=cfg.text_pretrained, seed=cfg.seed)
    raise NotImplementedError(
        f"Unsupported text encoder: {cfg.text_encoder}")


def textprocess(cfg: Config, testloader, encoder: Optional[TextEncoder] = None,
                cache_dir: str = ".") -> str:
    """Encode test-split captions -> npz; returns the filename."""
    encoder = encoder or make_text_encoder(cfg)
    texts = testloader.dataset.text
    embed = encoder.encode(texts, chunk_size=1000)
    fname = os.path.join(cache_dir,
                         f"{cfg.dataset}_{cfg.text_encoder}_text_embed.npz")
    np.savez(fname, bert_test_embed=embed)
    return fname


def textprocess_train(cfg: Config, texts: Sequence[str],
                      encoder: Optional[TextEncoder] = None,
                      cache_dir: str = ".") -> str:
    """Encode all train captions -> npz; returns the filename."""
    encoder = encoder or make_text_encoder(cfg)
    embed = encoder.encode(list(texts), chunk_size=2000)
    fname = os.path.join(
        cache_dir, f"{cfg.dataset}_{cfg.text_encoder}_train_text_embed.npz")
    np.savez(fname, bert_test_embed=embed)
    return fname


def load_or_process_file(file_type: str, process_fn: Callable, cfg: Config,
                         data_source, cache_dir: str = ".") -> Dict[str, np.ndarray]:
    """Compute-if-missing cache loader (utils.py:872-893)."""
    suffix = "text_embed" if file_type == "text" else "train_text_embed"
    fname = os.path.join(cache_dir,
                         f"{cfg.dataset}_{cfg.text_encoder}_{suffix}.npz")
    if not os.path.exists(fname):
        print(f"Processing {fname}...")
        process_fn(cfg, data_source, cache_dir=cache_dir)
    else:
        print(f"Loading {fname}...")
    return dict(np.load(fname))
