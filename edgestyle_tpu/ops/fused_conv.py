"""Fused GroupNorm→SiLU→3×3-conv Pallas kernel (NHWC).

The ResnetBlock2D chain (diffusers ResnetBlock2D semantics — reference
substrate used at train_text2image_pretrained_openpose.py:1234-1240 via the
SD1.5 UNet, and efficientvit has no counterpart) is the dominant compute of
both the ControlNet trunks (62% of a try-on step) and the UNet (32%)
per BASELINE.md's scan-20 breakdown.  XLA cannot fuse the elementwise
normalize+SiLU chain *into* the convolution custom call, so the activated
tensor makes a full HBM round-trip per conv.  This kernel computes

    out = conv3x3(silu(group_norm(x) * gamma + beta), kernel) + bias

in one pass: GN statistics are reduced by XLA (one cheap fp32 pass, fused
with the producer), folded into per-(batch, channel) scale/shift, and the
kernel applies affine+SiLU on the fly while performing the convolution as
nine shifted MXU matmuls over a zero-padded VMEM copy of the image.

Decomposition: with the activated image zero-padded to (H+3, W+2) and
flattened row-major to A ∈ ((H+3)(W+2), Cin),

    out[h, w] = Σ_{dy,dx∈0..2} A[h(W+2) + w + dy(W+2) + dx] · K[dy, dx]

i.e. nine *contiguous* row-slices of A, each a (H(W+2), Cin) × (Cin, TC)
matmul accumulated in fp32.  The two junk columns per row (w ∈ {W, W+1})
are sliced away at the end.  The extra bottom pad row keeps the largest
slice offset (2(W+2)+2) in bounds.

Backward: custom VJP that re-runs the XLA reference composition under
``jax.vjp`` — gradients are exact w.r.t. the reference math, and training
throughput is unchanged (the fused kernel targets the inference pipeline;
the train step keeps XLA's fused backward).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edgestyle_tpu.ops.norms import _moments, _use_fast

_VMEM_BUDGET = 10 * 1024 * 1024  # leave headroom for double-buffering
_FORCE_INTERPRET = False  # tests flip this to exercise the kernel on CPU


def _gn_scale_shift(x, gamma, beta, num_groups, eps):
    """Fold GN stats + affine into per-(B, C) fp32 scale/shift.

    Uses the same moment math as ops.norms.group_norm (single-pass for bf16,
    two-pass for fp32) so fused and unfused paths agree to rounding.
    """
    b, _, _, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean, var = _moments(xf, (1, 3), fast=_use_fast(x))
    rstd = jax.lax.rsqrt(var + eps)  # (B, 1, G, 1)
    per = c // num_groups
    mean_c = jnp.repeat(mean.reshape(b, num_groups), per, axis=1)  # (B, C)
    rstd_c = jnp.repeat(rstd.reshape(b, num_groups), per, axis=1)
    s = gamma.astype(jnp.float32)[None, :] * rstd_c
    t = beta.astype(jnp.float32)[None, :] - mean_c * s
    return s, t


def _pick_cout_tile(h, w, cin, cout, dtype_bytes=2):
    """Largest Cout tile whose working set fits the VMEM budget."""
    l_acc = h * (w + 2)
    x_bytes = h * w * cin * dtype_bytes
    pad_bytes = (h + 3) * (w + 2) * cin * dtype_bytes
    for tc in (cout, 512, 384, 320, 256, 160, 128, 64):
        if tc > cout or cout % tc:
            continue
        total = (
            x_bytes
            + pad_bytes
            + 9 * cin * tc * dtype_bytes  # kernel tile
            + l_acc * tc * 4              # fp32 accumulator
            + h * w * tc * dtype_bytes    # output tile
        )
        if total <= _VMEM_BUDGET:
            return tc
    return None


def _kernel(s_ref, t_ref, x_ref, k_ref, b_ref, o_ref, pad_ref):
    h, w, cin = x_ref.shape[1:]
    wp = w + 2
    l_out = h * wp

    # Zero the padded scratch once; only interior rows are ever rewritten.
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        pad_ref[...] = jnp.zeros_like(pad_ref)

    s = s_ref[0, 0].astype(jnp.float32)
    t = t_ref[0, 0].astype(jnp.float32)
    a = x_ref[0].astype(jnp.float32) * s + t
    act = (a * jax.nn.sigmoid(a)).astype(x_ref.dtype)
    pad_ref[1 : h + 1, 1 : w + 1, :] = act

    flat = pad_ref[...].reshape((h + 3) * wp, cin)
    acc = jnp.zeros((l_out, k_ref.shape[-1]), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            off = dy * wp + dx
            acc += jnp.dot(
                flat[off : off + l_out],
                k_ref[0, dy, dx],
                preferred_element_type=jnp.float32,
            )
    acc += b_ref[0, 0].astype(jnp.float32)
    out = acc.reshape(h, wp, -1)[:, :w, :]
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _pallas_forward(x, s, t, kernel, bias, interpret=False):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    tc = _pick_cout_tile(h, w, cin, cout, dtype_bytes=x.dtype.itemsize)
    if tc is None:  # pragma: no cover - shapes outside the SD1.5 family
        raise ValueError(f"no VMEM-feasible cout tile for {x.shape}->{cout}")
    nc = cout // tc
    # Mosaic wants trailing block dims divisible by (8, 128) or equal to the
    # array dims — pre-split the Cout axis so every block is a full slice.
    kc = (
        kernel.astype(x.dtype)
        .reshape(3, 3, cin, nc, tc)
        .transpose(3, 0, 1, 2, 4)  # (NC, 3, 3, Cin, TC)
    )
    bias2 = bias.astype(jnp.float32).reshape(nc, 1, tc)
    s3 = s.reshape(b, 1, cin)
    t3 = t.reshape(b, 1, cin)

    out = pl.pallas_call(
        _kernel,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cin), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h, w, cin), lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, 3, cin, tc),
                lambda i, j: (j, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, tc), lambda i, j: (j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, tc), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, nc, h, w, tc), x.dtype),
        scratch_shapes=[pltpu.VMEM(((h + 3), (w + 2), cin), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=(
                x.size * x.dtype.itemsize
                + kc.size * kc.dtype.itemsize * b
                + b * h * w * cout * x.dtype.itemsize
            ),
            transcendentals=b * h * w * cin,
        ),
        interpret=interpret,
    )(s3, t3, x, kc, bias2)
    if nc == 1:
        return out.reshape(b, h, w, cout)
    return out.transpose(0, 2, 3, 1, 4).reshape(b, h, w, cout)


def _reference(x, gn_scale, gn_bias, kernel, bias, num_groups, eps, dtype):
    """XLA composition — bit-compatible with the pre-fusion module code
    (GroupNorm(act=silu) then flax nn.Conv semantics)."""
    from edgestyle_tpu.ops.norms import group_norm

    h = group_norm(x, gn_scale, gn_bias, num_groups, eps, act=jax.nn.silu)
    out = jax.lax.conv_general_dilated(
        h.astype(dtype),
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _fused(x, gn_scale, gn_bias, kernel, bias, num_groups, eps, dtype):
    s, t = _gn_scale_shift(x, gn_scale, gn_bias, num_groups, eps)
    return _pallas_forward(x.astype(dtype), s, t, kernel, bias,
                           interpret=_FORCE_INTERPRET)


def _fused_fwd(x, gn_scale, gn_bias, kernel, bias, num_groups, eps, dtype):
    out = _fused(x, gn_scale, gn_bias, kernel, bias, num_groups, eps, dtype)
    return out, (x, gn_scale, gn_bias, kernel, bias)


def _fused_bwd(num_groups, eps, dtype, res, g):
    x, gn_scale, gn_bias, kernel, bias = res
    _, vjp = jax.vjp(
        lambda *a: _reference(*a, num_groups, eps, dtype),
        x, gn_scale, gn_bias, kernel, bias,
    )
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_conv_enabled() -> bool:
    """Default OFF: measured 2.01× vs XLA on the standalone 64×64×320 probe
    but 0.67→0.54 img/s END-TO-END on the full try-on (the unaligned-slice
    relayouts + per-Cout-tile act recompute lose to XLA's in-context conv,
    which already runs the trunks at ~50% MFU — see BASELINE.md). Kept as
    an opt-in experiment and a correctness-tested base for iteration."""
    return os.environ.get("EDGESTYLE_FUSED_CONV", "0") == "1"


def _eligible(x, kernel, num_groups) -> bool:
    if jax.default_backend() != "tpu" or not fused_conv_enabled():
        return False
    if x.dtype != jnp.bfloat16:
        return False
    if kernel.shape[:2] != (3, 3):
        return False
    b, h, w, cin = x.shape
    if cin % num_groups:
        return False
    return _pick_cout_tile(h, w, cin, kernel.shape[-1], 2) is not None


def norm_act_conv3x3(
    x, gn_scale, gn_bias, kernel, bias, *, num_groups=32, eps=1e-5, dtype=jnp.bfloat16
):
    """GroupNorm→SiLU→3×3 SAME conv: fused Pallas kernel on TPU/bf16,
    bit-compatible XLA composition otherwise (EDGESTYLE_FUSED_CONV=0 opts
    out, mirroring EDGESTYLE_FLASH)."""
    from edgestyle_tpu.ops.quant import _is_prequant

    if _is_prequant(kernel):
        # W8A8 serving path (ops/quant.py): the kernel was pre-quantized
        # by quantize_params outside the denoise scan; GN+SiLU runs in fp,
        # the activation is dynamically quantized, the conv runs on the
        # int8 MXU. (The Pallas fused path cannot consume int8 kernels —
        # the pipeline rejects QUANT+FUSED_CONV up front.)
        from edgestyle_tpu.ops.norms import group_norm
        from edgestyle_tpu.ops.quant import activation_to_int8

        h = group_norm(x, gn_scale, gn_bias, num_groups, eps, act=jax.nn.silu)
        qx, sx = activation_to_int8(h, kernel.key)
        out = jax.lax.conv_general_dilated(
            qx,
            kernel.q,
            window_strides=(1, 1),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        out = out.astype(jnp.float32) * (sx * kernel.s.reshape((1, 1, 1, -1)))
        return (out + bias.astype(jnp.float32)).astype(dtype)
    if _eligible(x, kernel, num_groups):
        return _fused(x, gn_scale, gn_bias, kernel, bias, num_groups, eps, dtype)
    return _reference(x, gn_scale, gn_bias, kernel, bias, num_groups, eps, dtype)
