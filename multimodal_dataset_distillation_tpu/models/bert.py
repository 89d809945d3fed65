"""Frozen text tower: a from-scratch Flax BERT encoder + CLS extraction.

Reference: ``TextEncoder`` (``networks.py:693-737``) wraps HF
``BertModel('bert-base-uncased')`` (frozen by default,
``text_trainable=False``), tokenizes with pad+truncate, and returns the
CLS-token (index 0) last hidden state.  Its outputs are pre-computed once
into npz caches (``data/__init__.py:153-191``) and the 768-d CLS vectors
are the *entire* text representation downstream — so the text tower runs
off the training hot path.

This implementation is a minimal, faithful BERT encoder in Flax:
* post-LN transformer ("original" BERT layout), exact GELU
* word/position/token-type embeddings + embedding LayerNorm
* weight import from a locally cached HF torch checkpoint when available
  (no network access is assumed); otherwise randomly initialized from the
  same config — mirroring the reference's ``BertModel(BertConfig())``
  fallback (``networks.py:708-710``).
* a ``tiny`` config for offline CI.

Tokenization uses the HF tokenizer when its vocab is cached locally, else
a deterministic hashing tokenizer (documented fallback for air-gapped
runs; embeddings are then random-init anyway, so no parity is lost).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


BERT_BASE = BertConfig()
BERT_TINY = BertConfig(vocab_size=4096, hidden_size=128, num_layers=2,
                       num_heads=2, intermediate_size=512,
                       max_position_embeddings=128)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        H, D = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        B, N, _ = x.shape
        q = nn.Dense(cfg.hidden_size, name="query")(x).reshape(B, N, H, D)
        k = nn.Dense(cfg.hidden_size, name="key")(x).reshape(B, N, H, D)
        v = nn.Dense(cfg.hidden_size, name="value")(x).reshape(B, N, H, D)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
        scores = scores + (1.0 - mask[:, None, None, :]) * -1e9
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                         preferred_element_type=jnp.float32)
        return out.reshape(B, N, cfg.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        attn = BertSelfAttention(cfg, name="attention")(x, mask)
        attn = nn.Dense(cfg.hidden_size, name="attention_output")(attn)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="attention_norm")(x + attn)
        h = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="output_norm")(x + h)


class BertEncoder(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask):
        cfg = self.cfg
        B, N = input_ids.shape
        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, name="word_embeddings")
        pe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                      name="position_embeddings")
        te = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                      name="token_type_embeddings")
        pos = jnp.arange(N)[None, :]
        x = we(input_ids) + pe(pos) + te(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)
        mask = attention_mask.astype(x.dtype)
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layer{i}")(x, mask)
        return x  # last_hidden_state; caller takes [:, 0] for CLS


# ---------------------------------------------------------------------------
# host-side orchestration: tokenization + frozen apply
# ---------------------------------------------------------------------------

class HashingTokenizer:
    """Deterministic offline fallback tokenizer (whitespace + md5 bucket).

    Only used when the HF vocab is not cached locally; in that regime the
    encoder weights are random-init too, so retrieval semantics (stable,
    distinct embeddings per caption) are preserved without network access.
    """

    def __init__(self, vocab_size: int, max_len: int = 64):
        self.vocab_size = vocab_size
        self.max_len = max_len
        self.cls_id, self.sep_id, self.pad_id = 1, 2, 0

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        def tok(word: str) -> int:
            h = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
            return 3 + h % (self.vocab_size - 3)

        rows = []
        for t in texts:
            ids = [self.cls_id] + [tok(w) for w in t.split()][: self.max_len - 2]
            ids.append(self.sep_id)
            rows.append(ids)
        n = max(len(r) for r in rows)
        ids = np.full((len(rows), n), self.pad_id, dtype=np.int32)
        mask = np.zeros((len(rows), n), dtype=np.int32)
        for i, r in enumerate(rows):
            ids[i, : len(r)] = r
            mask[i, : len(r)] = 1
        return ids, mask


def _try_hf_tokenizer():
    try:
        from transformers import AutoTokenizer

        tk = AutoTokenizer.from_pretrained("bert-base-uncased",
                                           local_files_only=True)

        def tokenize(texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
            enc = tk(list(texts), return_tensors="np", padding=True,
                     truncation=True)
            return (enc["input_ids"].astype(np.int32),
                    enc["attention_mask"].astype(np.int32))

        return tokenize
    except Exception:
        return None


def bert_params_from_hf_state_dict(sd, cfg: BertConfig):
    """Map a REAL-format HF ``BertModel.state_dict()`` onto our Flax tree.

    Pure renaming + Linear transposition; the key names below are the
    published ``transformers`` BertModel naming (what
    ``bert-base-uncased`` ships — ``networks.py:703-710`` loads it via
    HF).  Tested against an actual ``transformers.BertModel`` instance
    at toy size in ``tests/test_real_format_import.py`` (key source =
    the HF library itself, not this module's inverse).
    """
    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    def T(name):  # dense weights: torch (out,in) -> flax (in,out)
        return np.ascontiguousarray(sd[name].T)

    params: dict = {
        "word_embeddings": {"embedding": sd["embeddings.word_embeddings.weight"]},
        "position_embeddings": {"embedding": sd["embeddings.position_embeddings.weight"]},
        "token_type_embeddings": {"embedding": sd["embeddings.token_type_embeddings.weight"]},
        "embeddings_norm": {"scale": sd["embeddings.LayerNorm.weight"],
                            "bias": sd["embeddings.LayerNorm.bias"]},
    }
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}."
        params[f"layer{i}"] = {
            "attention": {
                "query": {"kernel": T(p + "attention.self.query.weight"),
                          "bias": sd[p + "attention.self.query.bias"]},
                "key": {"kernel": T(p + "attention.self.key.weight"),
                        "bias": sd[p + "attention.self.key.bias"]},
                "value": {"kernel": T(p + "attention.self.value.weight"),
                          "bias": sd[p + "attention.self.value.bias"]},
            },
            "attention_output": {
                "kernel": T(p + "attention.output.dense.weight"),
                "bias": sd[p + "attention.output.dense.bias"]},
            "attention_norm": {
                "scale": sd[p + "attention.output.LayerNorm.weight"],
                "bias": sd[p + "attention.output.LayerNorm.bias"]},
            "intermediate": {"kernel": T(p + "intermediate.dense.weight"),
                             "bias": sd[p + "intermediate.dense.bias"]},
            "output": {"kernel": T(p + "output.dense.weight"),
                       "bias": sd[p + "output.dense.bias"]},
            "output_norm": {"scale": sd[p + "output.LayerNorm.weight"],
                            "bias": sd[p + "output.LayerNorm.bias"]},
        }
    return {"params": params}


def _try_hf_weights(cfg: BertConfig):
    """Import bert-base-uncased weights from a local HF torch cache."""
    try:
        from transformers import BertModel

        m = BertModel.from_pretrained("bert-base-uncased",
                                      local_files_only=True)
        return bert_params_from_hf_state_dict(m.state_dict(), cfg)
    except Exception:
        return None


class TextEncoder:
    """Frozen BERT text tower returning CLS embeddings.

    Host-side convenience wrapper: holds frozen params, tokenizes on host,
    runs the jitted encoder in chunks on device.
    """

    def __init__(self, variant: str = "base", pretrained: bool = True,
                 seed: int = 0):
        self.cfg = BERT_BASE if variant == "base" else BERT_TINY
        self.module = BertEncoder(self.cfg)
        self.variables = None
        if pretrained and variant == "base":
            self.variables = _try_hf_weights(self.cfg)
        if self.variables is None:
            key = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, 8), jnp.int32)
            self.variables = self.module.init(key, dummy, jnp.ones_like(dummy))
        tok = _try_hf_tokenizer() if variant == "base" else None
        self.tokenize = tok or HashingTokenizer(self.cfg.vocab_size)
        self._apply = jax.jit(
            lambda v, ids, mask: self.module.apply(v, ids, mask)[:, 0, :])

    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    def encode(self, texts: Sequence[str], chunk_size: int = 256) -> np.ndarray:
        """CLS embeddings for a list of raw strings, chunked (float32)."""
        out = []
        for i in range(0, len(texts), chunk_size):
            ids, mask = self.tokenize(texts[i : i + chunk_size])
            out.append(np.asarray(self._apply(self.variables, ids, mask)))
        return np.concatenate(out, axis=0)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode(texts)
