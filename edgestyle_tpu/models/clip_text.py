"""CLIP text encoder (openai/clip-vit-large-patch14 text tower) in JAX.

The reference uses the CLIP text encoder twice: as the SD1.5 conditioning
encoder (frozen, /root/reference/train_text2image_pretrained_openpose.py:722,
1164) and inside the prompt-mining / dataset-filtering CLIP
(/root/reference/model/utils.py:647-684, dataset_local.py:49-53).

Text tower: 12 layers, width 768, 12 heads, quick-GELU activation, causal
mask, max 77 positions; final LayerNorm. SD1.5 consumes the full
last-hidden-state sequence; prompt mining additionally needs the pooled
EOS-token projection (`text_projection`, no bias).
"""

from __future__ import annotations

import dataclasses
import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.core.porting import KeyMapper
from edgestyle_tpu.models.layers import LayerNorm


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate_size: int = 3072
    projection_dim: int = 768
    # "quick_gelu" for the original CLIP-L used by SD1.5
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        c = self.cfg.hidden_size
        h = self.cfg.num_heads
        d = c // h
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        b, n, _ = x.shape
        qh = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        logits = logits * (d**-0.5) + causal_mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal_mask):
        act = quick_gelu if self.cfg.hidden_act == "quick_gelu" else jax.nn.gelu
        x = x + CLIPAttention(self.cfg, self.dtype, name="self_attn")(
            LayerNorm(eps=self.cfg.layer_norm_eps, name="layer_norm1")(x), causal_mask
        )
        h = LayerNorm(eps=self.cfg.layer_norm_eps, name="layer_norm2")(x)
        h = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = act(h)
        h = nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array):
        """input_ids: (B, 77) int32 → dict with last_hidden_state (B,77,768)
        and pooled_output (B,768) taken at the argmax (EOS) token, matching
        HF CLIPTextModel pooling."""
        cfg = self.cfg
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(
            input_ids
        )
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
            jnp.float32,
        )
        n = input_ids.shape[1]
        x = tok + pos[None, :n].astype(self.dtype)

        mask = jnp.triu(jnp.full((n, n), -jnp.inf, dtype=jnp.float32), k=1)
        causal_mask = mask[None, None]

        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal_mask)
        x = LayerNorm(eps=cfg.layer_norm_eps, name="final_layer_norm")(x)

        eos_idx = jnp.argmax(input_ids, axis=-1)
        pooled = jnp.take_along_axis(x, eos_idx[:, None, None], axis=1)[:, 0]
        return {"last_hidden_state": x, "pooled_output": pooled}


class CLIPTextModelWithProjection(nn.Module):
    """Adds the bias-free text_projection used by prompt mining."""

    cfg: CLIPTextConfig = CLIPTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        out = CLIPTextEncoder(self.cfg, self.dtype, name="text_model")(input_ids)
        proj = nn.Dense(
            self.cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
        )(out["pooled_output"])
        return {**out, "text_embeds": proj}


def port_clip_text_state_dict(sd, num_layers: int = 12):
    """HF CLIPTextModel state dict → CLIPTextEncoder params (flat)."""
    m = KeyMapper()
    m.rule(
        r"text_model\.embeddings\.token_embedding\.weight", "token_embedding.embedding"
    )
    m.rule(
        r"text_model\.embeddings\.position_embedding\.weight", "position_embedding"
    )
    m.norm(r"text_model\.final_layer_norm", "final_layer_norm")
    for i in range(num_layers):
        p = rf"text_model\.encoder\.layers\.{i}"
        q = f"layers_{i}"
        m.norm(p + r"\.layer_norm1", q + ".layer_norm1")
        m.norm(p + r"\.layer_norm2", q + ".layer_norm2")
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            m.linear(p + rf"\.self_attn\.{proj}", q + f".self_attn.{proj}")
        m.linear(p + r"\.mlp\.fc1", q + ".fc1")
        m.linear(p + r"\.mlp\.fc2", q + ".fc2")
    # ignore HF position_ids buffer if present
    m.rule(r"text_model\.embeddings\.position_ids", "_drop")
    out = m.apply(sd)
    out.pop("_drop", None)
    return out
