"""Opt-in W8A8 int8 quantization for the serving path.

The reference has no quantization story — this is a TPU-native performance
feature, not a parity item. The v5e MXU has an int8 multiply path at 2x
the bf16 peak (394 TOPS vs 197 TFLOP/s); the try-on pipeline spends ~50%
of device time in convolutions at ~56% of the bf16 peak (BASELINE.md
round-2 device profile), so routing the big convs and token matmuls
through the int8 path is the one remaining >1.2x latency lever at this
architecture. Measured speedups for the pipeline's own hot shapes are in
BASELINE.md (scripts/probe_int8.py).

Scheme (standard post-training W8A8, no calibration pass needed):
  - weights:     symmetric per-output-channel int8, scale = absmax/127
  - activations: symmetric per-tensor *dynamic* int8 (scale computed on
    the fly inside the jitted program — an extra reduction + requant pass
    per op, already counted in the probe's measured speedup)
  - accumulation in int32 on the MXU, dequantized to the layer dtype

Integration is zero-touch via ``flax.linen.intercept_methods``: the
pipeline wraps ONLY the denoise-step model calls (MultiControlNet + UNet)
in :func:`quantize_intercept`, which swaps every large-enough
``nn.Conv``/``nn.Dense`` `__call__` for the int8 equivalent reading the
module's own (bf16 master) params. Param trees, checkpoints, and every
other code path are untouched; VAE / CLIP / time-embedding / zero-conv
heads stay in bf16 (quality-sensitive or too small to matter).

Training is never quantized.
"""

from __future__ import annotations

import contextlib
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

# ops smaller than this do not earn their requant overhead and carry most
# of the numeric risk (zero-conv heads, time MLPs, tiny-test configs)
MIN_QUANT_CHANNELS = 64


def quantize_weight(w: jax.Array, contract_axes: Tuple[int, ...]):
    """Symmetric per-output-channel int8: contract_axes are the axes the
    matmul/conv reduces over (everything but the output-feature axis)."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=contract_axes, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(w32 / s).astype(jnp.int8)
    return q, s


def quantize_activation(x: jax.Array):
    """Symmetric per-tensor dynamic int8."""
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32)) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.round(x32 / s).astype(jnp.int8)
    return q, s


def _norm_pair(v):
    if isinstance(v, int):
        return (v, v)
    if isinstance(v, (tuple, list)) and len(v) == 1:
        return (v[0], v[0])
    return tuple(v)


def _conv_quantizable(mod: nn.Conv, x: jax.Array) -> bool:
    if x.ndim != 4:
        return False
    kh, kw = _norm_pair(mod.kernel_size)
    cin = x.shape[-1] // mod.feature_group_count
    if cin < MIN_QUANT_CHANNELS or mod.features < MIN_QUANT_CHANNELS:
        return False
    # stick to the forms the models actually use; bail on anything exotic
    if _norm_pair(getattr(mod, "kernel_dilation", 1)) != (1, 1):
        return False
    if _norm_pair(getattr(mod, "input_dilation", 1)) != (1, 1):
        return False
    if isinstance(mod.padding, str) and mod.padding.upper() not in ("SAME", "VALID"):
        return False
    return True


def quant_conv(mod: nn.Conv, x: jax.Array) -> jax.Array:
    """int8 re-implementation of the nn.Conv forms used in this package
    (NHWC x HWIO, optional stride, SAME/VALID/explicit padding)."""
    params = mod.variables["params"]
    kernel = params["kernel"]
    if _is_prequant(kernel):
        qw, sw = kernel["q"], kernel["s"]
    else:
        qw, sw = quantize_weight(kernel, (0, 1, 2))  # HWIO → per-O
    qx, sx = quantize_activation(x)
    strides = _norm_pair(mod.strides or 1)
    padding = mod.padding
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif not isinstance(padding, str):
        padding = tuple(_norm_pair(p) for p in padding)
    dn = lax.conv_dimension_numbers(x.shape, qw.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(
        qx, qw, strides, padding,
        dimension_numbers=dn,
        feature_group_count=mod.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw.reshape((1, 1, 1, -1)))
    if mod.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(mod.dtype or x.dtype)


def _dense_quantizable(mod: nn.Dense, x: jax.Array) -> bool:
    if x.ndim < 2:
        return False
    if x.shape[-1] < MIN_QUANT_CHANNELS or mod.features < MIN_QUANT_CHANNELS:
        return False
    # only worth it on token/spatial matmuls; (B, C) vectors (time embeds,
    # pooled heads) are latency-trivial and precision-sensitive
    return x.ndim >= 3 and x.shape[-2] >= 64


def quant_dense(mod: nn.Dense, x: jax.Array) -> jax.Array:
    params = mod.variables["params"]
    kernel = params["kernel"]  # (in, out)
    if _is_prequant(kernel):
        qw, sw = kernel["q"], kernel["s"]
    else:
        qw, sw = quantize_weight(kernel, (0,))
    qx, sx = quantize_activation(x)
    y = lax.dot_general(
        qx, qw, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (sx * sw.reshape((1,) * (x.ndim - 1) + (-1,)))
    if mod.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(mod.dtype or x.dtype)


# --------------------------------------------------------------- prequant
# Per-call weight quantization is correct but expensive inside the UniPC
# denoise scan: XLA does NOT hoist the absmax/round passes out of the loop,
# and re-reading + re-quantizing ~1.3 GB of kernels every step measured
# 393 ms/generation of convert_reduce fusions (device trace, BASELINE.md).
# quantize_params() therefore pre-quantizes each kernel ONCE per traced
# program — the kernel leaf becomes {"q": int8, "s": f32 scale} and the
# interceptor consumes it directly; int8 weights also halve the kernel
# HBM streaming the convs pay per step.

# Dense layers that run on (B, C) vectors (time embeddings) are skipped by
# NAME at tree level — the interceptor's x.ndim gate can't be evaluated
# there, and they are latency-trivial anyway.
_SKIP_NAME_PARTS = ("time_embedding", "time_emb_proj")


def _is_prequant(kernel) -> bool:
    return isinstance(kernel, dict) and "q" in kernel and "s" in kernel


def quantize_params(tree):
    """Pre-quantize every large conv/dense kernel in a param tree.

    Conv kernels (HWIO, ndim 4) with Cin ≥ MIN_QUANT_CHANNELS and
    Cout ≥ MIN_QUANT_CHANNELS, and Dense kernels ((in, out), ndim 2) with
    both dims ≥ MIN_QUANT_CHANNELS, become {"q": int8, "s": scale}; every
    other leaf passes through untouched. Trace this OUTSIDE the denoise
    scan so the quantization work runs once per generation."""

    def walk(sub, path):
        if isinstance(sub, dict) and not _is_prequant(sub):
            return {k: walk(v, path + (k,)) for k, v in sub.items()}
        leaf = sub
        if path and path[-1] == "kernel" and hasattr(leaf, "ndim"):
            if any(p in part for p in _SKIP_NAME_PARTS for part in path):
                return leaf
            if leaf.ndim == 4 and min(leaf.shape[2], leaf.shape[3]) >= MIN_QUANT_CHANNELS:
                q, s = quantize_weight(leaf, (0, 1, 2))
                return {"q": q, "s": s}
            if leaf.ndim == 2 and min(leaf.shape) >= MIN_QUANT_CHANNELS:
                q, s = quantize_weight(leaf, (0,))
                return {"q": q, "s": s}
        return leaf

    return walk(tree, ())


def _kernel_qs(params):
    k = params["kernel"]
    if _is_prequant(k):
        return k["q"], k["s"]
    return None


def _dequant_kernel(k):
    return k["q"].astype(jnp.float32) * k["s"]


def _interceptor(next_fun, args, kwargs, context):
    mod = context.module
    if context.method_name != "__call__" or type(mod) not in (nn.Conv, nn.Dense):
        return next_fun(*args, **kwargs)
    x = args[0]
    params = mod.variables["params"]
    pre = _is_prequant(params["kernel"])
    if type(mod) is nn.Conv:
        if pre or _conv_quantizable(mod, x):
            return quant_conv(mod, x)
    else:
        if pre and x.ndim < 3:
            # pre-quantized by shape but input is a plain vector batch:
            # dequantize and run the exact op (safety net; the name skips
            # should make this unreachable)
            kernel = _dequant_kernel(params["kernel"])
            y = x.astype(jnp.float32) @ kernel
            if mod.use_bias:
                y = y + params["bias"].astype(jnp.float32)
            return y.astype(mod.dtype or x.dtype)
        if pre or _dense_quantizable(mod, x):
            return quant_dense(mod, x)
    return next_fun(*args, **kwargs)


def quantize_intercept(enable: bool = True):
    """Context manager: trace every nn.Conv / nn.Dense call inside as
    W8A8 int8 (large ops only — see the _quantizable gates)."""
    if not enable:
        return contextlib.nullcontext()
    return nn.intercept_methods(_interceptor)
