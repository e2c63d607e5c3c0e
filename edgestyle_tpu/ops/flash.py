"""Fused flash-attention Pallas kernels (forward + backward) for the UNet's
spatial self-attention.

The SD1.5 UNet's hot attentions run at N=4096/1024 tokens with head dims
40/80 — bandwidth-bound in XLA (the (N,N) probs matrix costs ~1 GB of HBM
round-trips per 4096-token layer at CFG batch 2; attention was ~60% of the
denoise step and flash gave 2.45× end to end). No (N,N) tensor ever
touches HBM:

  * forward: 3-D grid (batch·heads, q-blocks, k-blocks) streaming K/V tiles
    through VMEM with the online-softmax recurrence in scratch (TPU grid
    steps execute sequentially per core, so scratch persists across the
    k axis); also emits the row logsumexp for the backward.
  * backward: the standard two-pass flash recurrence —
      D   = rowsum(dO ∘ O)
      P   = exp(S·scale − L)
      dV += Pᵀ dO;  dS = P ∘ (dO Vᵀ − D);  dQ += dS K·scale;  dK += dSᵀ Q·scale
    pass 1 (dq) iterates k-blocks per q-block; pass 2 (dk, dv) iterates
    q-blocks per k-block. Both recompute P from (q, k, L) — no stored probs.

Head dims are zero-padded to 128 lanes host-side: padding the contraction
(QKᵀ) and output (PV) dims to the MXU's native 128 costs no extra MXU
passes; padded v/o lanes are sliced off and padded q/k lanes contribute 0
to every dot product, so gradients in the padding are exactly 0 and are
dropped by the final slice.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


# ------------------------------------------------------------------ forward
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc_ref, m_ref, l_ref, *, scale):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk) fp32

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, jax.lax.broadcast_in_dim(m_cur, m_prev.shape, (0, 1)))
    p = jnp.exp(s - m_new[:, :1])
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_prev * alpha + jax.lax.broadcast_in_dim(
        jnp.sum(p, axis=-1, keepdims=True), l_prev.shape, (0, 1)
    )
    acc_ref[:] = acc_ref[:] * alpha[:, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new
    l_ref[:] = l_new

    @pl.when(kk == nk - 1)
    def _out():
        o_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)
        # lane-replicated row logsumexp (TPU blocks need a 128 lane dim)
        lse_ref[0] = m_ref[:] + jnp.log(l_ref[:])


def _pad_lane(x, d, dp):
    if dp == d:
        return x
    return jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, dp - d)])


def _flash_forward(q, k, v, scale, block_q=1024, block_k=1024, return_lse=False):
    # block sweep on v5e (batch-6 4096-token trunk shape): 1024/1024 ≈ 28%
    # faster than 512/1024; fits VMEM with the fp32 (bq, bk) probs tile
    b, h, n, d = q.shape
    nk = k.shape[2]
    block_q = min(block_q, n)
    block_k = min(block_k, nk)
    if n % block_q or nk % block_k:
        raise ValueError(f"seq lengths ({n},{nk}) not divisible by blocks")

    dp = max(LANE, ((d + LANE - 1) // LANE) * LANE)
    qf = _pad_lane(q, d, dp).reshape(b * h, n, dp)
    kf = _pad_lane(k, d, dp).reshape(b * h, nk, dp)
    vf = _pad_lane(v, d, dp).reshape(b * h, nk, dp)

    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, n, dp), q.dtype),
            jax.ShapeDtypeStruct((b * h, n, LANE), jnp.float32),
        ),
        grid=(b * h, n // block_q, nk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, LANE), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf)
    out = out.reshape(b, h, n, dp)[..., :d]
    if return_lse:
        return out, lse[..., 0].reshape(b, h, n)
    return out


# ----------------------------------------------------------------- backward
def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dq_ref, acc_ref, *, scale):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]  # (bq, 1) from lane-replicated block
    dlt = dlt_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dlt)  # (bq, bk)
    acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(kk == nk - 1)
    def _out():
        dq_ref[0] = acc_ref[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dlt_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale):
    jj = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(jj == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    dlt = dlt_ref[0][:, :1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)
    p = jnp.exp(s - lse)
    dv_acc[:] = dv_acc[:] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bk, d)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - dlt)
    dk_acc[:] = dk_acc[:] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(jj == nj - 1)
    def _out():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, scale, block_q=512, block_k=512):
    b, h, n, d = q.shape
    nk = k.shape[2]
    block_q = min(block_q, n)
    block_k = min(block_k, nk)
    if n % block_q or nk % block_k:
        raise ValueError("bad blocks")

    dp_lane = max(LANE, ((d + LANE - 1) // LANE) * LANE)
    qf = _pad_lane(q, d, dp_lane).reshape(b * h, n, dp_lane)
    kf = _pad_lane(k, d, dp_lane).reshape(b * h, nk, dp_lane)
    vf = _pad_lane(v, d, dp_lane).reshape(b * h, nk, dp_lane)
    gf = _pad_lane(g, d, dp_lane).reshape(b * h, n, dp_lane)
    # lane-replicate lse and D = rowsum(dO ∘ O) to the 128-lane layout
    lsef = jnp.broadcast_to(lse.reshape(b * h, n, 1), (b * h, n, LANE))
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).reshape(b * h, n, 1)
    delta = jnp.broadcast_to(delta, (b * h, n, LANE))

    common_specs = dict(memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dp_lane), jnp.float32),
        grid=(b * h, n // block_q, nk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp_lane), lambda i, j, kk: (i, j, 0), **common_specs),
            pl.BlockSpec((1, block_k, dp_lane), lambda i, j, kk: (i, kk, 0), **common_specs),
            pl.BlockSpec((1, block_k, dp_lane), lambda i, j, kk: (i, kk, 0), **common_specs),
            pl.BlockSpec((1, block_q, dp_lane), lambda i, j, kk: (i, j, 0), **common_specs),
            pl.BlockSpec((1, block_q, LANE), lambda i, j, kk: (i, j, 0), **common_specs),
            pl.BlockSpec((1, block_q, LANE), lambda i, j, kk: (i, j, 0), **common_specs),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp_lane), lambda i, j, kk: (i, j, 0),
                               **common_specs),
        scratch_shapes=[pltpu.VMEM((block_q, dp_lane), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, gf, lsef, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, nk, dp_lane), jnp.float32),
            jax.ShapeDtypeStruct((b * h, nk, dp_lane), jnp.float32),
        ),
        grid=(b * h, nk // block_k, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, dp_lane), lambda i, kk, j: (i, j, 0), **common_specs),
            pl.BlockSpec((1, block_k, dp_lane), lambda i, kk, j: (i, kk, 0), **common_specs),
            pl.BlockSpec((1, block_k, dp_lane), lambda i, kk, j: (i, kk, 0), **common_specs),
            pl.BlockSpec((1, block_q, dp_lane), lambda i, kk, j: (i, j, 0), **common_specs),
            pl.BlockSpec((1, block_q, LANE), lambda i, kk, j: (i, j, 0), **common_specs),
            pl.BlockSpec((1, block_q, LANE), lambda i, kk, j: (i, j, 0), **common_specs),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, dp_lane), lambda i, kk, j: (i, kk, 0), **common_specs),
            pl.BlockSpec((1, block_k, dp_lane), lambda i, kk, j: (i, kk, 0), **common_specs),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, dp_lane), jnp.float32),
            pltpu.VMEM((block_k, dp_lane), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf, gf, lsef, delta)

    shape = lambda x: x.reshape(b, h, -1, dp_lane)[..., :d]
    return (
        shape(dq).astype(q.dtype),
        shape(dk).astype(k.dtype),
        shape(dv).astype(v.dtype),
    )


# -------------------------------------------------------------- custom vjp
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float = 1.0):
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    out, lse = _flash_forward(q, k, v, scale, return_lse=True)
    return out, (q, k, v, out, lse)


def _bwd(scale, res, g):
    import os

    q, k, v, out, lse = res
    # block sizes read at trace time (env for A/B sweeps). r3 device-trace
    # sweep on the full train step: 1024/1024 cut the flash custom-call
    # total 23.4→21.7 ms/sample vs 512/512 (BASELINE.md train profile), so
    # 1024 is the default — mirroring the forward's 512→1024 win.
    bq = int(os.environ.get("EDGESTYLE_FLASH_BWD_BQ", "1024"))
    bk = int(os.environ.get("EDGESTYLE_FLASH_BWD_BK", "1024"))
    return _flash_backward(q, k, v, out, lse, g, scale, block_q=bq, block_k=bk)


flash_attention.defvjp(_fwd, _bwd)
