"""CLIP vision tower (ViT-B/32 layout) in Flax.

Reference: ``ImageEncoder`` with ``--image_encoder=clip`` wraps OpenAI
CLIP ViT-B/32 and calls ``model.encode_image(x)`` (``networks.py:659-661,
679-680``), yielding 512-d projected features.  (The reference's dim
table puts 'clip' in the 1000-d else-branch, ``networks.py:819`` — a
latent bug, since encode_image returns 512; here the registry carries the
true 512.)

CLIP-style differences from the plain ViT in ``vit.py``: pre-LN blocks
with QuickGELU, a LayerNorm immediately after patch+position embedding
(``ln_pre``), CLS pooling through ``ln_post``, and a width->embed_dim
projection.  Weight import from a locally cached HF
``openai/clip-vit-base-patch32`` when available; random init otherwise.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from multimodal_dataset_distillation_tpu.models.clip_text import quick_gelu


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    num_layers: int = 12
    num_heads: int = 12
    embed_dim: int = 512
    layer_norm_eps: float = 1e-5


CLIP_VIT_B32 = ClipVisionConfig()


class ClipVisionBlock(nn.Module):
    width: int
    num_heads: int
    eps: float

    @nn.compact
    def __call__(self, x):
        H, D = self.num_heads, self.width // self.num_heads
        B, N, _ = x.shape
        h = nn.LayerNorm(epsilon=self.eps, name="ln_1")(x)
        q = nn.Dense(self.width, name="q_proj")(h).reshape(B, N, H, D)
        k = nn.Dense(self.width, name="k_proj")(h).reshape(B, N, H, D)
        v = nn.Dense(self.width, name="v_proj")(h).reshape(B, N, H, D)
        scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * (D ** -0.5)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhnm,bmhd->bnhd", probs, v,
                          preferred_element_type=jnp.float32)
        x = x + nn.Dense(self.width, name="out_proj")(
            attn.reshape(B, N, self.width))
        h = nn.LayerNorm(epsilon=self.eps, name="ln_2")(x)
        h = nn.Dense(4 * self.width, name="mlp_fc")(h)
        h = quick_gelu(h)
        return x + nn.Dense(self.width, name="mlp_proj")(h)


class ClipVisionTransformer(nn.Module):
    cfg: ClipVisionConfig = CLIP_VIT_B32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        cfg = self.cfg
        B = x.shape[0]
        x = nn.Conv(cfg.width, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size),
                    padding="VALID", use_bias=False, name="patch_embed")(x)
        x = x.reshape(B, -1, cfg.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.width)), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (x.shape[1], cfg.width))
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_pre")(x)
        for i in range(cfg.num_layers):
            x = ClipVisionBlock(cfg.width, cfg.num_heads, cfg.layer_norm_eps,
                                name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="ln_post")(x[:, 0])
        proj = self.param("proj", nn.initializers.normal(0.01),
                          (cfg.width, cfg.embed_dim))
        return jnp.dot(x, proj, preferred_element_type=jnp.float32)


def try_hf_clip_vision_weights(cfg: ClipVisionConfig = CLIP_VIT_B32):
    """Import vision-tower weights from a local HF CLIP torch cache."""
    try:
        from transformers import CLIPModel

        m = CLIPModel.from_pretrained("openai/clip-vit-base-patch32",
                                      local_files_only=True)
        sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

        def T(name):
            return np.ascontiguousarray(sd[name].T)

        # HF conv weight (out,in,kh,kw) -> flax (kh,kw,in,out)
        pw = sd["vision_model.embeddings.patch_embedding.weight"]
        params: dict = {
            "patch_embed": {"kernel": np.transpose(pw, (2, 3, 1, 0))},
            "class_embedding": sd["vision_model.embeddings.class_embedding"],
            "positional_embedding":
                sd["vision_model.embeddings.position_embedding.weight"],
            "ln_pre": {"scale": sd["vision_model.pre_layrnorm.weight"],
                       "bias": sd["vision_model.pre_layrnorm.bias"]},
            "ln_post": {"scale": sd["vision_model.post_layernorm.weight"],
                        "bias": sd["vision_model.post_layernorm.bias"]},
            "proj": T("visual_projection.weight"),
        }
        for i in range(cfg.num_layers):
            p = f"vision_model.encoder.layers.{i}."
            params[f"block{i}"] = {
                "ln_1": {"scale": sd[p + "layer_norm1.weight"],
                         "bias": sd[p + "layer_norm1.bias"]},
                "ln_2": {"scale": sd[p + "layer_norm2.weight"],
                         "bias": sd[p + "layer_norm2.bias"]},
                "q_proj": {"kernel": T(p + "self_attn.q_proj.weight"),
                           "bias": sd[p + "self_attn.q_proj.bias"]},
                "k_proj": {"kernel": T(p + "self_attn.k_proj.weight"),
                           "bias": sd[p + "self_attn.k_proj.bias"]},
                "v_proj": {"kernel": T(p + "self_attn.v_proj.weight"),
                           "bias": sd[p + "self_attn.v_proj.bias"]},
                "out_proj": {"kernel": T(p + "self_attn.out_proj.weight"),
                             "bias": sd[p + "self_attn.out_proj.bias"]},
                "mlp_fc": {"kernel": T(p + "mlp.fc1.weight"),
                           "bias": sd[p + "mlp.fc1.bias"]},
                "mlp_proj": {"kernel": T(p + "mlp.fc2.weight"),
                             "bias": sd[p + "mlp.fc2.bias"]},
            }
        return {"params": params}
    except Exception:
        return None
