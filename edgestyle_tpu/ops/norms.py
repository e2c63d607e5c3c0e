"""Normalization ops, NHWC, fp32 statistics.

GroupNorm is the workhorse norm of the SD1.5 UNet / VAE / ControlNet
(torch ``nn.GroupNorm(32, C)`` in the reference's diffusers substrate).
We compute statistics in fp32 regardless of compute dtype — matching
torch's fp32 autocast behaviour for norms — and let XLA fuse the
normalize+affine(+activation) chain into neighbouring convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _moments(xf: jax.Array, axes, fast: bool):
    """(mean, var) over `axes` in fp32.

    fast=True computes both from one read of x (mean of x and x² in a single
    multi-output fusion → one fewer full HBM pass per norm); the E[x²]−E[x]²
    cancellation is far below bf16 input quantization, so it is the default
    for bf16 activations. fast=False is torch's two-pass form — bit-matched
    for the fp32 golden-parity suite.
    """
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    if fast:
        m2 = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
        var = jnp.maximum(m2 - jnp.square(mean), 0.0)
    else:
        var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    return mean, var


def _use_fast(x: jax.Array) -> bool:
    return x.dtype == jnp.bfloat16


def group_norm(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    act=None,
) -> jax.Array:
    """GroupNorm over the trailing channel axis of an NHWC (or N...C) array.

    x: (..., C); scale/bias: (C,). Statistics are taken over all non-batch
    axes within each group, matching torch GroupNorm semantics.
    """
    orig_dtype = x.dtype
    c = x.shape[-1]
    if c % num_groups != 0:
        raise ValueError(f"channels {c} not divisible by groups {num_groups}")
    b = x.shape[0]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean, var = _moments(xf, (1, 3), fast=_use_fast(x))
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(x.shape)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act is not None:
        out = act(out)
    return out.astype(orig_dtype)


def layer_norm(x: jax.Array, scale: jax.Array, bias: jax.Array, eps: float = 1e-5):
    """LayerNorm over the trailing axis with fp32 stats."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean, var = _moments(xf, -1, fast=_use_fast(x))
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
