"""Fused flash-attention Pallas kernel for the UNet's spatial self-attention.

The SD1.5 UNet's hot attentions run at N=4096/1024 tokens with head dims
40/80 — bandwidth-bound in XLA (the (N,N) probs matrix costs ~1 GB of HBM
round-trips per 4096-token layer at CFG batch 2; attention is ~60% of the
denoise step). This kernel never materializes probs in HBM: a 3-D grid
(batch·heads, q-blocks, k-blocks) streams K/V tiles through VMEM with the
online-softmax recurrence held in scratch across the k-block axis (TPU
grid steps execute sequentially per core, so scratch persists).

Head dims are zero-padded to 128 lanes on the host side: padding the
contraction (QKᵀ) and output (PV) dims to the MXU's native 128 costs no
extra MXU passes, and zero-padded K columns contribute exp(0-m)=… nothing
because the padded q·k products are 0 only in the d-axis — correctness is
exact (padded v lanes are sliced off).

Forward = Pallas; backward = custom_vjp recompute in plain XLA (training
is conv-dominated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *, scale):
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (bq, d) — native dtype, MXU accumulates fp32
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk) fp32

    # m/l held lane-replicated (bq, LANE) to keep VPU-friendly layouts
    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
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


def _flash_forward(q, k, v, scale, block_q=1024, block_k=1024):
    # block sweep on v5e (batch-6 4096-token trunk shape): 1024/1024 ≈ 28%
    # faster than 512/1024; fits VMEM with the fp32 (bq, bk) probs tile
    b, h, n, d = q.shape
    nk = k.shape[2]
    block_q = min(block_q, n)
    block_k = min(block_k, nk)
    if n % block_q or nk % block_k:
        raise ValueError(f"seq lengths ({n},{nk}) not divisible by blocks")

    dp = max(LANE, ((d + LANE - 1) // LANE) * LANE)
    pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
    q_p = jnp.pad(q, pad) if dp != d else q
    k_p = jnp.pad(k, pad) if dp != d else k
    v_p = jnp.pad(v, pad) if dp != d else v

    qf = q_p.reshape(b * h, n, dp)
    kf = k_p.reshape(b * h, nk, dp)
    vf = v_p.reshape(b * h, nk, dp)

    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dp), q.dtype),
        grid=(b * h, n // block_q, nk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_q, dp), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
            pltpu.VMEM((block_q, LANE), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vf)
    out = out.reshape(b, h, n, dp)
    return out[..., :d] if dp != d else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float = 1.0):
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _xla_attention_f32(q, k, v, scale):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s.astype(jnp.float32) * scale, axis=-1)
    return p, jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _bwd(scale, res, g):
    q, k, v = res

    def f(q, k, v):
        _, o = _xla_attention_f32(q, k, v, scale)
        return o

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
