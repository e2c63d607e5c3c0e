"""EfficientViT op library in NHWC JAX.

Functional rebuild of the vendored efficientvit building blocks the
reference's SAM segmenters run on (/root/reference/efficientvit/models/nn/
ops.py): ConvLayer (conv+norm+act), DSConv / MBConv / FusedMBConv /
ResBlock, and LiteMLA — the signature relu-linear multi-scale attention
(ops.py:334-447) whose `q·(kᵀ[v;1]) / (q·(kᵀ1)+ε)` contraction pair is
exactly two MXU matmuls per head (O(N) in sequence length).

Norm conventions: 'bn' is inference-style BatchNorm (scale/bias/mean/var as
params — the encoders are frozen in every reference training path), 'ln2d'
is channel-only LayerNorm per spatial position. GELU is the tanh
approximation (reference act registry, efficientvit/models/nn/act.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def act_fn(name: Optional[str]):
    if name is None:
        return None
    return {
        "relu": jax.nn.relu,
        "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
        "hswish": jax.nn.hard_swish,
        "silu": jax.nn.silu,
        "gelu": functools.partial(jax.nn.gelu, approximate=True),
    }[name]


class BatchNorm2d(nn.Module):
    """Inference-style BN: y = (x - mean) · scale/√(var+eps) + bias."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (c,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x.astype(jnp.float32) - mean) * inv + bias


class LayerNorm2d(nn.Module):
    """Channel-only LayerNorm at each spatial position (torch LayerNorm2d,
    efficientvit/models/nn/norm.py:16-22)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias).astype(x.dtype)


def build_norm(name: Optional[str], module_name: str, eps: float = 1e-5):
    if name is None:
        return None
    if name == "bn":
        return BatchNorm2d(eps=eps, name=module_name)
    if name == "ln2d":
        return LayerNorm2d(eps=eps, name=module_name)
    raise ValueError(name)


class ConvLayer(nn.Module):
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    use_bias: bool = False
    norm: Optional[str] = "bn"
    act: Optional[str] = "gelu"
    norm_eps: float = 1e-5  # reference set_norm_eps: SAM 1e-6, l-seg/cls 1e-7
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = nn.Conv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        norm = build_norm(self.norm, "norm", self.norm_eps)
        if norm is not None:
            x = norm(x).astype(self.dtype)
        a = act_fn(self.act)
        if a is not None:
            x = a(x)
        return x


class DSConv(nn.Module):
    out_channels: int
    stride: int = 1
    use_bias: Tuple[bool, bool] = (False, False)
    norm: Tuple[Optional[str], Optional[str]] = ("bn", "bn")
    act: Tuple[Optional[str], Optional[str]] = ("relu6", None)
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = ConvLayer(
            c, 3, self.stride, groups=c, use_bias=self.use_bias[0],
            norm=self.norm[0], act=self.act[0], norm_eps=self.norm_eps,
            dtype=self.dtype, name="depth_conv",
        )(x)
        x = ConvLayer(
            self.out_channels, 1, use_bias=self.use_bias[1],
            norm=self.norm[1], act=self.act[1], norm_eps=self.norm_eps,
            dtype=self.dtype, name="point_conv",
        )(x)
        return x


class MBConv(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: float = 6
    use_bias: Tuple[bool, bool, bool] = (False, False, False)
    norm: Tuple[Optional[str], ...] = ("bn", "bn", "bn")
    act: Tuple[Optional[str], ...] = ("relu6", "relu6", None)
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = round(x.shape[-1] * self.expand_ratio)
        x = ConvLayer(
            mid, 1, use_bias=self.use_bias[0], norm=self.norm[0], act=self.act[0],
            norm_eps=self.norm_eps, dtype=self.dtype, name="inverted_conv",
        )(x)
        x = ConvLayer(
            mid, 3, self.stride, groups=mid, use_bias=self.use_bias[1],
            norm=self.norm[1], act=self.act[1], norm_eps=self.norm_eps,
            dtype=self.dtype, name="depth_conv",
        )(x)
        x = ConvLayer(
            self.out_channels, 1, use_bias=self.use_bias[2], norm=self.norm[2],
            act=self.act[2], norm_eps=self.norm_eps, dtype=self.dtype,
            name="point_conv",
        )(x)
        return x


class FusedMBConv(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: float = 6
    use_bias: Tuple[bool, bool] = (False, False)
    norm: Tuple[Optional[str], Optional[str]] = ("bn", "bn")
    act: Tuple[Optional[str], Optional[str]] = ("relu6", None)
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = round(x.shape[-1] * self.expand_ratio)
        x = ConvLayer(
            mid, 3, self.stride, use_bias=self.use_bias[0], norm=self.norm[0],
            act=self.act[0], norm_eps=self.norm_eps, dtype=self.dtype,
            name="spatial_conv",
        )(x)
        x = ConvLayer(
            self.out_channels, 1, use_bias=self.use_bias[1], norm=self.norm[1],
            act=self.act[1], norm_eps=self.norm_eps, dtype=self.dtype,
            name="point_conv",
        )(x)
        return x


class ResBlock(nn.Module):
    out_channels: int
    stride: int = 1
    expand_ratio: float = 1
    use_bias: Tuple[bool, bool] = (False, False)
    norm: Tuple[Optional[str], Optional[str]] = ("bn", "bn")
    act: Tuple[Optional[str], Optional[str]] = ("relu6", None)
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        mid = round(x.shape[-1] * self.expand_ratio)
        x = ConvLayer(
            mid, 3, self.stride, use_bias=self.use_bias[0], norm=self.norm[0],
            act=self.act[0], norm_eps=self.norm_eps, dtype=self.dtype, name="conv1",
        )(x)
        x = ConvLayer(
            self.out_channels, 3, 1, use_bias=self.use_bias[1], norm=self.norm[1],
            act=self.act[1], norm_eps=self.norm_eps, dtype=self.dtype, name="conv2",
        )(x)
        return x


def relu_linear_attention(qkv: jax.Array, dim: int, eps: float = 1e-15) -> jax.Array:
    """LiteMLA core (reference ops.py:397-434), NHWC, forced fp32.

    qkv: (B, H, W, heads*3*dim) grouped per head as [q|k|v] blocks of
    `dim` channels. Returns (B, H, W, heads*dim).

    out = q·(kᵀ·[v;1]) / last-column — two MXU matmuls of shape
    (N×d)(d×(d+1)) per head; O(N) in token count.
    """
    b, h, w, c = qkv.shape
    n = h * w
    heads = c // (3 * dim)
    x = qkv.astype(jnp.float32).reshape(b, n, heads, 3 * dim)
    x = x.transpose(0, 2, 1, 3)  # (B, heads, N, 3d)
    q, k, v = x[..., :dim], x[..., dim : 2 * dim], x[..., 2 * dim :]
    q = jax.nn.relu(q)
    k = jax.nn.relu(k)
    v1 = jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)  # (B,h,N,d+1)
    kv = jnp.einsum("bhnd,bhne->bhde", k, v1)  # (B,h,d,d+1)
    out = jnp.einsum("bhnd,bhde->bhne", q, kv)  # (B,h,N,d+1)
    out = out[..., :-1] / (out[..., -1:] + eps)
    out = out.transpose(0, 2, 1, 3).reshape(b, h, w, heads * dim)
    return out


class LiteMLA(nn.Module):
    """Lightweight multi-scale linear attention (reference ops.py:334-447):
    1x1 qkv conv → multi-scale depthwise 5x5 + grouped 1x1 aggregation →
    relu-linear attention per scale → 1x1 proj (+bn)."""

    out_channels: int
    dim: int = 8
    heads_ratio: float = 1.0
    scales: Tuple[int, ...] = (5,)
    norm: Tuple[Optional[str], Optional[str]] = (None, "bn")
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    eps: float = 1e-15
    impl: str = "auto"  # 'xla' | 'pallas' | 'auto'

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        heads = int(in_ch // self.dim * self.heads_ratio)
        total = heads * self.dim
        qkv = ConvLayer(
            3 * total, 1, use_bias=False, norm=self.norm[0], act=None,
            norm_eps=self.norm_eps, dtype=self.dtype, name="qkv",
        )(x)
        multi = [qkv]
        for i, scale in enumerate(self.scales):
            y = nn.Conv(
                3 * total, (scale, scale),
                padding=((scale // 2, scale // 2), (scale // 2, scale // 2)),
                feature_group_count=3 * total, use_bias=False,
                dtype=self.dtype, name=f"aggreg_{i}_depth",
            )(qkv)
            y = nn.Conv(
                3 * total, (1, 1), feature_group_count=3 * heads, use_bias=False,
                dtype=self.dtype, name=f"aggreg_{i}_point",
            )(y)
            multi.append(y)

        outs = [
            relu_linear_attention(m, self.dim, self.eps).astype(self.dtype)
            for m in multi
        ]
        out = jnp.concatenate(outs, axis=-1)
        out = ConvLayer(
            self.out_channels, 1, use_bias=False, norm=self.norm[1], act=None,
            norm_eps=self.norm_eps, dtype=self.dtype, name="proj",
        )(out)
        return out


class EfficientViTBlock(nn.Module):
    """LiteMLA + MBConv, both residual (reference ops.py:458-492)."""

    dim: int = 32
    expand_ratio: float = 6
    act: str = "hswish"
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = x + LiteMLA(c, dim=self.dim, norm=(None, "bn"),
                        norm_eps=self.norm_eps, dtype=self.dtype,
                        name="context_module")(x)
        x = x + MBConv(
            c, expand_ratio=self.expand_ratio, use_bias=(True, True, False),
            norm=(None, None, "bn"), act=(self.act, self.act, None),
            norm_eps=self.norm_eps, dtype=self.dtype, name="local_module",
        )(x)
        return x
