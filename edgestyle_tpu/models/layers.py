"""Shared NHWC building blocks for the SD1.5 family (VAE / UNet / ControlNet).

Functional equivalents of the diffusers blocks the reference builds on
(SURVEY.md §2.1: reference subclasses diffusers UNet2DConditionModel /
ControlNetModel / AutoencoderKL), re-designed for TPU:

  * NHWC everywhere; conv kernels HWIO → convs lower straight onto the MXU.
  * GroupNorm/LayerNorm/softmax accumulate fp32 (ops/norms.py).
  * No data-dependent control flow; every block is shape-static and jit-safe.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.ops.attention import multi_head_attention
from edgestyle_tpu.ops.norms import group_norm, layer_norm
from edgestyle_tpu.ops.tome import ToMeConfig


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jax.Array:
    """Sinusoidal timestep embedding, matching diffusers get_timestep_embedding
    semantics used by SD1.5 (flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        act = jax.nn.silu if self.act == "silu" else None
        return group_norm(x, scale, bias, self.num_groups, self.eps, act=act)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm(x, scale, bias, self.eps)


class TimestepEmbedding(nn.Module):
    """linear(in→time_embed_dim) → silu → linear."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = jax.nn.silu(h)
        h = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(h)
        return h


class _NormParams(nn.Module):
    """Param-compatible stand-in for GroupNorm that only *declares* the
    scale/bias so the norm can fuse across the module boundary into the
    following conv (ops/fused_conv.py)."""

    @nn.compact
    def __call__(self, ch: int):
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        return scale, bias


class _Conv3x3Params(nn.Module):
    """Param-compatible stand-in for nn.Conv(features, (3,3)) — same names,
    shapes, and init — that exposes kernel/bias for the fused path."""

    features: int

    @nn.compact
    def __call__(self, in_ch: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, in_ch, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D semantics: GN→silu→conv, (+time proj),
    GN→silu→conv, skip (1x1 if channels change).

    The GN→silu→3×3-conv chains go through ops.fused_conv.norm_act_conv3x3:
    a fused Pallas kernel on TPU/bf16, the bit-compatible XLA composition
    elsewhere. Param tree is unchanged from the nn.Conv/GroupNorm form."""

    out_channels: int
    eps: float = 1e-5
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb: Optional[jax.Array] = None):
        from edgestyle_tpu.ops.fused_conv import norm_act_conv3x3

        in_ch = x.shape[-1]
        g1, b1 = _NormParams(name="norm1")(in_ch)
        k1, kb1 = _Conv3x3Params(self.out_channels, name="conv1")(in_ch)
        h = norm_act_conv3x3(
            x, g1, b1, k1, kb1, num_groups=32, eps=self.eps, dtype=self.dtype
        )
        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                jax.nn.silu(temb)
            )
            h = h + t[:, None, None, :]
        g2, b2 = _NormParams(name="norm2")(self.out_channels)
        k2, kb2 = _Conv3x3Params(self.out_channels, name="conv2")(self.out_channels)
        h = norm_act_conv3x3(
            h, g2, b2, k2, kb2, num_groups=32, eps=self.eps, dtype=self.dtype
        )
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    """Stride-2 3x3 conv. The VAE encoder uses asymmetric (0,1,0,1) padding,
    the UNet symmetric padding=1."""

    out_channels: int
    asymmetric_pad: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric_pad else ((1, 1), (1, 1))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype, name="conv"
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbour 2x then 3x3 conv (diffusers Upsample2D)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv"
        )(x)


class VaeAttentionBlock(nn.Module):
    """Single-head spatial self-attention used in VAE mid blocks
    (diffusers Attention with GroupNorm(32, eps=1e-6) + linear qkv)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(num_groups=32, eps=1e-6, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        out = multi_head_attention(q, k, v, num_heads=1, impl="xla")
        out = nn.Dense(c, dtype=self.dtype, name="to_out")(out)
        return residual + out.reshape(b, h, w, c)


class CrossAttention(nn.Module):
    """to_q/to_k/to_v (no bias) + to_out, multi-head."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, x, context: Optional[jax.Array] = None):
        c = x.shape[-1]
        context = x if context is None else context
        q = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(c, use_bias=False, dtype=self.dtype, name="to_v")(context)
        out = multi_head_attention(q, k, v, self.num_heads, impl=self.attn_impl)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward: proj to 8*dim, split, gelu gate, proj back."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(c * 8, dtype=self.dtype, name="proj_in")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(c, dtype=self.dtype, name="proj_out")(h)


class BasicTransformerBlock(nn.Module):
    """LN→self-attn, LN→cross-attn, LN→GEGLU FF; all residual.

    ``tome`` (ops/tome.ToMeConfig, opt-in — NOT a reference feature)
    merges the most redundant spatial tokens around the self-attention
    (and, with merge_mlp, the feed-forward) when ``hw`` is given and the
    token count reaches tome.min_tokens. tome=None is byte-identical to
    the plain block."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    tome: Optional["ToMeConfig"] = None

    @nn.compact
    def __call__(self, x, context, hw: Optional[tuple] = None):
        n = x.shape[1]
        use_tome = (
            self.tome is not None and hw is not None and self.tome.applies(n)
        )
        if use_tome:
            from edgestyle_tpu.ops.tome import build_merge

            merge, unmerge, _ = build_merge(
                x, hw[0], hw[1], int(self.tome.ratio * n)
            )
            attn1 = CrossAttention(
                self.num_heads, self.dtype, self.attn_impl, name="attn1"
            )
            x = x + unmerge(attn1(merge(LayerNorm(name="norm1")(x))))
        else:
            x = x + CrossAttention(self.num_heads, self.dtype, self.attn_impl, name="attn1")(
                LayerNorm(name="norm1")(x)
            )
        x = x + CrossAttention(self.num_heads, self.dtype, "xla", name="attn2")(
            LayerNorm(name="norm2")(x), context
        )
        ff = GEGLUFeedForward(self.dtype, name="ff")
        if use_tome and self.tome.merge_mlp:
            x = x + unmerge(ff(merge(LayerNorm(name="norm3")(x))))
        else:
            x = x + ff(LayerNorm(name="norm3")(x))
        return x


class Transformer2D(nn.Module):
    """GroupNorm → 1x1 conv proj_in → transformer blocks over flattened
    spatial tokens → 1x1 conv proj_out → residual (SD1.5 layout:
    use_linear_projection=False, depth=1)."""

    num_heads: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    tome: Optional["ToMeConfig"] = None

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(num_groups=32, eps=1e-6, name="norm")(x)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        for i in range(self.depth):
            y = BasicTransformerBlock(
                self.num_heads, self.dtype, self.attn_impl, self.tome,
                name=f"blocks_{i}",
            )(y, context, hw=(h, w))
        y = y.reshape(b, h, w, c)
        y = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(y)
        return y + residual
