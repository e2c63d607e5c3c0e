"""Opt-in W8A8 int8 quantization for the serving path.

The reference has no quantization story — this is a TPU-native performance
feature, not a parity item. The v5e MXU has an int8 multiply path at 2x
the bf16 peak (394 TOPS vs 197 TFLOP/s); the try-on pipeline spends ~50%
of device time in convolutions at ~56% of the bf16 peak (BASELINE.md
round-2 device profile), so routing the big convs and token matmuls
through the int8 path is the one remaining >1.2x latency lever at this
architecture. Measured speedups for the pipeline's own hot shapes are in
BASELINE.md (scripts/probe_int8.py).

Scheme (standard post-training W8A8):
  - weights:     symmetric per-output-channel int8, scale = absmax/127,
    pre-quantized once per generation (quantize_params)
  - activations: symmetric per-tensor int8, two modes:
      * dynamic ("int8"): scale = absmax on the fly. Simple and
        calibration-free, but the absmax is a full reduction BARRIER in
        front of every conv that stops XLA fusing the GN→SiLU producer
        chain into the conv — measured ~370 ms/generation of standalone
        convert_reduce fusions (BASELINE.md int8 trace).
      * static ("int8-static"): per-layer scales recorded once by a
        calibration pass (:func:`recording` + the pipeline's
        ``calibrate_int8``), then baked into the trace as constants — the
        quantize step becomes pure elementwise (mul+round+clip) and fuses
        back into the producer like the bf16 program.
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


# ------------------------------------------------- activation scale modes
# Module-level context managed by the two context managers below. Tracing
# is synchronous within a `with` block, so plain globals are sufficient
# (the serving path funnels all device work through one worker thread).
_STATIC_SCALES = None  # dict[key, float] — trace-time constants
_RECORDER = None       # dict[key, traced scalar] — calibration collection


@contextlib.contextmanager
def recording(rec: dict):
    """Collect dynamic activation scales per layer key during a trace.

    Inside the block every quantized op runs the DYNAMIC path (whatever
    static table is installed) and stores jnp.maximum-accumulated scale
    scalars into ``rec``. Trace the model under this, return ``dict(rec)``
    from the jitted function, and the scales come out as concrete values —
    that is the whole calibration pass (pipelines/tryon.py
    ``calibrate_int8``)."""
    global _RECORDER
    old = _RECORDER
    _RECORDER = rec
    try:
        yield rec
    finally:
        _RECORDER = old


def activation_to_int8(x: jax.Array, key=None):
    """Quantize an activation honoring the current mode: recording →
    dynamic + collect; static table hit → constant-scale mul+round+clip
    (fusable, no reduction); otherwise dynamic."""
    x32 = x.astype(jnp.float32)
    if _RECORDER is not None and key is not None:
        q, s = quantize_activation(x)
        prev = _RECORDER.get(key)
        _RECORDER[key] = s if prev is None else jnp.maximum(prev, s)
        return q, s
    if _STATIC_SCALES is not None and key is not None and key in _STATIC_SCALES:
        s = float(_STATIC_SCALES[key])
        q = jnp.clip(jnp.round(x32 / s), -127.0, 127.0).astype(jnp.int8)
        return q, s
    return quantize_activation(x)


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
        qw, sw = kernel.q, kernel.s
    else:
        qw, sw = quantize_weight(kernel, (0, 1, 2))  # HWIO → per-O
    qx, sx = activation_to_int8(x, kernel.key if _is_prequant(kernel) else None)
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
        qw, sw = kernel.q, kernel.s
    else:
        qw, sw = quantize_weight(kernel, (0,))
    qx, sx = activation_to_int8(x, kernel.key if _is_prequant(kernel) else None)
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

# Skipped by NAME at tree level:
# - time embeddings run on (B, C) vectors — the interceptor's x.ndim gate
#   can't be evaluated at tree level, and they are latency-trivial;
# - the ControlNet zero-conv heads (controlnet_down_blocks_*/
#   controlnet_mid_block) write directly onto the residuals injected into
#   the UNet — quality-sensitive and a small fraction of conv FLOPs, so
#   they stay bf16 as the module docstring promises.
_SKIP_NAME_PARTS = ("time_embedding", "time_emb_proj", "controlnet_")


@jax.tree_util.register_pytree_node_class
class QuantKernel:
    """Pre-quantized kernel: int8 values + per-output-channel scale, with
    the layer's tree path carried as STATIC metadata (usable as a python
    string at trace time — keys the static activation-scale table). Being
    a registered pytree node it flows through jit boundaries, flax
    variable dicts, and device_put like any other param leaf pair."""

    def __init__(self, q, s, key: str = ""):
        self.q = q
        self.s = s
        self.key = key

    def tree_flatten(self):
        return (self.q, self.s), self.key

    @classmethod
    def tree_unflatten(cls, key, children):
        return cls(children[0], children[1], key)


def _is_prequant(kernel) -> bool:
    return isinstance(kernel, QuantKernel)


def quantize_params(tree, prefix: str = ""):
    """Pre-quantize every large conv/dense kernel in a param tree.

    Conv kernels (HWIO, ndim 4) with Cin ≥ MIN_QUANT_CHANNELS and
    Cout ≥ MIN_QUANT_CHANNELS, and Dense kernels ((in, out), ndim 2) with
    both dims ≥ MIN_QUANT_CHANNELS, become QuantKernel leaves; every
    other leaf passes through untouched. Trace this OUTSIDE the denoise
    scan so the quantization work runs once per generation.

    ``prefix`` namespaces the static activation-scale keys: the ControlLoRA
    trunk deliberately has IDENTICAL param names to the UNet (weight
    tying), so un-prefixed keys would silently max-merge up to four
    different layers' calibrated scales into one entry. Tied kernels
    quantized under several prefixes cost nothing extra at runtime: the
    q/s computations are identical ops on the same traced arrays, which
    XLA CSEs into one buffer (only the static key metadata differs)."""

    def walk(sub, path):
        if isinstance(sub, dict):
            return {k: walk(v, path + (k,)) for k, v in sub.items()}
        leaf = sub
        if path and path[-1] == "kernel" and hasattr(leaf, "ndim"):
            if any(p in part for p in _SKIP_NAME_PARTS for part in path):
                return leaf
            pre = (prefix,) if prefix else ()
            if leaf.ndim == 4 and min(leaf.shape[2], leaf.shape[3]) >= MIN_QUANT_CHANNELS:
                q, s = quantize_weight(leaf, (0, 1, 2))
                return QuantKernel(q, s, "/".join(pre + path))
            if leaf.ndim == 2 and min(leaf.shape) >= MIN_QUANT_CHANNELS:
                q, s = quantize_weight(leaf, (0,))
                return QuantKernel(q, s, "/".join(pre + path))
        return leaf

    return walk(tree, ())


def quantize_denoise_params(params):
    """The ONE definition of the quantized scope for the denoise step:
    the UNet tree and every ControlNet branch tree (static conv-cond +
    ControlLoRA branches), each under its own key prefix; fusion blocks,
    VAE and CLIP stay untouched. Used identically by generation
    (pipelines/tryon.py _generate) and calibration (calibrate_int8) so
    the static table always matches the serving layer set."""
    cn = {
        k: quantize_params(v, prefix=k)
        if k.startswith("lora_") or k == "static" else v
        for k, v in params["controlnet"].items()
    }
    return {
        **params,
        "unet": quantize_params(params["unet"], prefix="unet"),
        "controlnet": cn,
    }


def _dequant_kernel(k):
    return k.q.astype(jnp.float32) * k.s


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


@contextlib.contextmanager
def quantize_intercept(enable: bool = True, static_scales=None):
    """Context manager: trace every nn.Conv / nn.Dense call inside as
    W8A8 int8 (large ops only — see the _quantizable gates). Pass a
    ``static_scales`` table ({layer key: float}) to use calibrated
    constant activation scales instead of dynamic absmax."""
    global _STATIC_SCALES
    if not enable:
        yield
        return
    old = _STATIC_SCALES
    _STATIC_SCALES = static_scales
    try:
        with nn.intercept_methods(_interceptor):
            yield
    finally:
        _STATIC_SCALES = old
