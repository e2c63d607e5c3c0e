"""CLIP vision tower (ViT-L/14) + the dual-tower similarity used by the
reference's prompt mining and dataset filtering.

The reference loads the full `openai/clip-vit-large-patch14` CLIPModel for
(a) zero-shot color/clothing retrieval (BestEmbeddings,
/root/reference/model/utils.py:647-684), (b) image-pair similarity
filtering of training data (dataset_local.py:116-162), and (c) CLIP-IQA
quality scoring in dataset extraction. This is the vision half; the text
half lives in clip_text.py.

ViT-L/14: 24 layers, width 1024, 16 heads, patch 14, 224px input, class
token, pre-LN; projection to the 768-d shared space.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.core.porting import KeyMapper
from edgestyle_tpu.models.clip_text import CLIPLayer, CLIPTextConfig
from edgestyle_tpu.models.layers import LayerNorm

CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    patch_size: int = 14
    image_size: int = 224
    intermediate_size: int = 4096
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self):
        return (self.image_size // self.patch_size) ** 2

    def as_layer_cfg(self) -> CLIPTextConfig:
        # reuse the text-tower layer (same pre-LN block, quick-GELU)
        return CLIPTextConfig(
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            hidden_act="quick_gelu",
            layer_norm_eps=self.layer_norm_eps,
        )


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array):
        """pixel_values: (B, 224, 224, 3), CLIP-normalized. Returns
        last_hidden_state (B, 1+P, C) and pooled_output (post-LN class
        token), matching HF CLIPVisionModel."""
        cfg = self.cfg
        b = pixel_values.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values)
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,), jnp.float32
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.hidden_size)), x], axis=1
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.02),
            (1 + cfg.num_patches, cfg.hidden_size),
            jnp.float32,
        )
        x = x + pos[None].astype(x.dtype)
        x = LayerNorm(eps=cfg.layer_norm_eps, name="pre_layrnorm")(x)
        zero_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)  # no causal mask
        lcfg = cfg.as_layer_cfg()
        for i in range(cfg.num_layers):
            x = CLIPLayer(lcfg, self.dtype, name=f"layers_{i}")(x, zero_mask)
        pooled = LayerNorm(eps=cfg.layer_norm_eps, name="post_layernorm")(x[:, 0])
        return {"last_hidden_state": x, "pooled_output": pooled}


class CLIPVisionModelWithProjection(nn.Module):
    cfg: CLIPVisionConfig = CLIPVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        out = CLIPVisionEncoder(self.cfg, self.dtype, name="vision_model")(pixel_values)
        proj = nn.Dense(
            self.cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(out["pooled_output"])
        return {**out, "image_embeds": proj}


def clip_preprocess(img01: jax.Array, image_size: int = 224) -> jax.Array:
    """(B,H,W,3) in [0,1] → bicubic resize to 224 + CLIP normalize."""
    b = img01.shape[0]
    x = jax.image.resize(img01, (b, image_size, image_size, 3), method="bicubic")
    mean = jnp.asarray(CLIP_IMAGE_MEAN)
    std = jnp.asarray(CLIP_IMAGE_STD)
    return (x - mean) / std


def port_clip_vision_state_dict(sd, num_layers: int = 24):
    """HF CLIPVisionModel(WithProjection) state dict → flat params."""
    m = KeyMapper()
    m.conv(r"vision_model\.embeddings\.patch_embedding", "vision_model.patch_embedding")
    m.rule(r"vision_model\.embeddings\.class_embedding", "vision_model.class_embedding")
    m.rule(
        r"vision_model\.embeddings\.position_embedding\.weight",
        "vision_model.position_embedding",
    )
    m.norm(r"vision_model\.pre_layrnorm", "vision_model.pre_layrnorm")
    m.norm(r"vision_model\.post_layernorm", "vision_model.post_layernorm")
    for i in range(num_layers):
        p = rf"vision_model\.encoder\.layers\.{i}"
        q = f"vision_model.layers_{i}"
        m.norm(p + r"\.layer_norm1", q + ".layer_norm1")
        m.norm(p + r"\.layer_norm2", q + ".layer_norm2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m.linear(p + rf"\.self_attn\.{proj}", q + f".self_attn.{proj}")
        m.linear(p + r"\.mlp\.fc1", q + ".fc1")
        m.linear(p + r"\.mlp\.fc2", q + ".fc2")
    m.linear(r"visual_projection", "visual_projection")
    m.rule(r"vision_model\.embeddings\.position_ids", "_drop")
    out = m.apply(sd, strict=False)
    out.pop("_drop", None)
    return out
