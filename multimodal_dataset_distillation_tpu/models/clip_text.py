"""Frozen CLIP text tower: causal transformer + EOT pooling + projection.

Reference: ``TextEncoder`` with ``--text_encoder=clip`` wraps OpenAI CLIP
ViT-B/32's text transformer via ``clip.load`` and calls
``model.encode_text(clip.tokenize(texts))`` (``networks.py:700-702,
728-731``), yielding 512-d embeddings (``networks.py:821-822``).  Like the
BERT tower it is frozen (``text_trainable=False``) and its outputs are
cached once (``data/__init__.py:153-191``), so it lives off the hot path.

This is a from-scratch Flax implementation of that tower:
* token embedding (vocab 49408) + learned positional embedding (context 77)
* pre-LN residual attention blocks with a causal mask and QuickGELU
* final LayerNorm, features taken at the EOT token (argmax of ids — EOT
  has the highest id in the CLIP vocab), then the 512x512 text projection
* weight import from a locally cached HF ``openai/clip-vit-base-patch32``
  checkpoint when present; otherwise random init from the same config
  (mirrors the BERT fallback — air-gapped runs keep stable semantics).

Tokenization uses the HF CLIP tokenizer when cached locally, else a
deterministic hashing tokenizer in the same id layout (SOT=start,
EOT=end-of-text as the *highest* id so argmax pooling still lands on it).
"""

from __future__ import annotations

import dataclasses
import hashlib
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    width: int = 512
    num_layers: int = 12
    num_heads: int = 8
    context_length: int = 77
    embed_dim: int = 512          # output (projected) dim
    layer_norm_eps: float = 1e-5


CLIP_TEXT_BASE = ClipTextConfig()
CLIP_TEXT_TINY = ClipTextConfig(vocab_size=4096, width=128, num_layers=2,
                                num_heads=2, context_length=32, embed_dim=128)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class ClipAttention(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        H, D = cfg.num_heads, cfg.width // cfg.num_heads
        B, N, _ = x.shape
        q = nn.Dense(cfg.width, name="q_proj")(x).reshape(B, N, H, D)
        k = nn.Dense(cfg.width, name="k_proj")(x).reshape(B, N, H, D)
        v = nn.Dense(cfg.width, name="v_proj")(x).reshape(B, N, H, D)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
        scores = scores + causal_mask[None, None, :, :]
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                         preferred_element_type=jnp.float32)
        return nn.Dense(cfg.width, name="out_proj")(out.reshape(B, N, cfg.width))


class ClipBlock(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, x, causal_mask):
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_1")(x)
        x = x + ClipAttention(cfg, name="attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_2")(x)
        h = nn.Dense(4 * cfg.width, name="mlp_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(cfg.width, name="mlp_proj")(h)


class ClipTextTransformer(nn.Module):
    cfg: ClipTextConfig

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.cfg
        B, N = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.width, name="token_embedding")
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        x = tok(input_ids) + pos[None, :N, :]
        causal = jnp.triu(jnp.full((N, N), -1e9, jnp.float32), k=1)
        for i in range(cfg.num_layers):
            x = ClipBlock(cfg, name=f"block{i}")(x, causal)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_final")(x)
        # EOT pooling: argmax of ids (EOT is the highest id in CLIP vocab)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(B), eot]
        proj = self.param("text_projection", nn.initializers.normal(0.01),
                          (cfg.width, cfg.embed_dim))
        return jnp.dot(pooled, proj, preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# host-side orchestration
# ---------------------------------------------------------------------------

class ClipHashingTokenizer:
    """Deterministic offline fallback in the CLIP id layout (SOT first,
    EOT = vocab_size-1 so argmax pooling finds it)."""

    def __init__(self, vocab_size: int, context_length: int):
        self.vocab_size = vocab_size
        self.context_length = context_length
        self.sot_id = vocab_size - 2
        self.eot_id = vocab_size - 1

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        def tok(word: str) -> int:
            h = int(hashlib.md5(word.encode()).hexdigest()[:8], 16)
            return 1 + h % (self.vocab_size - 3)

        n = self.context_length
        ids = np.zeros((len(texts), n), dtype=np.int32)
        for i, t in enumerate(texts):
            row = [self.sot_id] + [tok(w) for w in t.split()][: n - 2]
            row.append(self.eot_id)
            ids[i, : len(row)] = row
        return ids


def _try_hf_clip_tokenizer(context_length: int):
    try:
        from transformers import CLIPTokenizer

        tk = CLIPTokenizer.from_pretrained("openai/clip-vit-base-patch32",
                                           local_files_only=True)

        def tokenize(texts: Sequence[str]) -> np.ndarray:
            enc = tk(list(texts), return_tensors="np", padding="max_length",
                     max_length=context_length, truncation=True)
            return enc["input_ids"].astype(np.int32)

        return tokenize
    except Exception:
        return None


def clip_text_params_from_hf_state_dict(sd, cfg: ClipTextConfig):
    """Map a REAL-format HF ``CLIPModel.state_dict()`` text branch onto
    our Flax tree (pure renaming + Linear transposition; key names are
    the published ``transformers`` CLIPModel naming).  Tested against an
    actual toy ``transformers.CLIPModel`` in
    ``tests/test_real_format_import.py``."""
    sd = {k: (v.detach().numpy() if hasattr(v, "detach") else np.asarray(v))
          for k, v in sd.items()}

    def T(name):
        return np.ascontiguousarray(sd[name].T)

    params: dict = {
        "token_embedding": {
            "embedding": sd["text_model.embeddings.token_embedding.weight"]},
        "positional_embedding":
            sd["text_model.embeddings.position_embedding.weight"],
        "ln_final": {"scale": sd["text_model.final_layer_norm.weight"],
                     "bias": sd["text_model.final_layer_norm.bias"]},
        "text_projection": T("text_projection.weight"),
    }
    for i in range(cfg.num_layers):
        p = f"text_model.encoder.layers.{i}."
        params[f"block{i}"] = {
            "ln_1": {"scale": sd[p + "layer_norm1.weight"],
                     "bias": sd[p + "layer_norm1.bias"]},
            "ln_2": {"scale": sd[p + "layer_norm2.weight"],
                     "bias": sd[p + "layer_norm2.bias"]},
            "attn": {
                "q_proj": {"kernel": T(p + "self_attn.q_proj.weight"),
                           "bias": sd[p + "self_attn.q_proj.bias"]},
                "k_proj": {"kernel": T(p + "self_attn.k_proj.weight"),
                           "bias": sd[p + "self_attn.k_proj.bias"]},
                "v_proj": {"kernel": T(p + "self_attn.v_proj.weight"),
                           "bias": sd[p + "self_attn.v_proj.bias"]},
                "out_proj": {"kernel": T(p + "self_attn.out_proj.weight"),
                             "bias": sd[p + "self_attn.out_proj.bias"]},
            },
            "mlp_fc": {"kernel": T(p + "mlp.fc1.weight"),
                       "bias": sd[p + "mlp.fc1.bias"]},
            "mlp_proj": {"kernel": T(p + "mlp.fc2.weight"),
                         "bias": sd[p + "mlp.fc2.bias"]},
        }
    return {"params": params}


def _try_hf_clip_text_weights(cfg: ClipTextConfig):
    """Import text-tower weights from a local HF CLIP torch cache."""
    try:
        from transformers import CLIPModel

        m = CLIPModel.from_pretrained("openai/clip-vit-base-patch32",
                                      local_files_only=True)
        return clip_text_params_from_hf_state_dict(m.state_dict(), cfg)
    except Exception:
        return None


class ClipTextEncoder:
    """Frozen CLIP text tower returning projected EOT embeddings (512-d).

    Same host-side interface as the BERT :class:`TextEncoder`: tokenize on
    host, jitted frozen apply in chunks on device.
    """

    def __init__(self, variant: str = "base", pretrained: bool = True,
                 seed: int = 0):
        self.cfg = CLIP_TEXT_BASE if variant == "base" else CLIP_TEXT_TINY
        self.module = ClipTextTransformer(self.cfg)
        self.variables = None
        if pretrained and variant == "base":
            self.variables = _try_hf_clip_text_weights(self.cfg)
        if self.variables is None:
            key = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, self.cfg.context_length), jnp.int32)
            self.variables = self.module.init(key, dummy)
        tok = (_try_hf_clip_tokenizer(self.cfg.context_length)
               if variant == "base" else None)
        self.tokenize = tok or ClipHashingTokenizer(self.cfg.vocab_size,
                                                    self.cfg.context_length)
        self._apply = jax.jit(lambda v, ids: self.module.apply(v, ids))

    @property
    def hidden_size(self) -> int:
        return self.cfg.embed_dim

    def encode(self, texts: Sequence[str], chunk_size: int = 256) -> np.ndarray:
        out = []
        for i in range(0, len(texts), chunk_size):
            ids = self.tokenize(texts[i : i + chunk_size])
            out.append(np.asarray(self._apply(self.variables, ids)))
        return np.concatenate(out, axis=0)

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        return self.encode(texts)
