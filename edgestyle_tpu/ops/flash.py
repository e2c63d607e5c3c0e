"""Fused flash-attention Pallas kernel for the UNet's spatial self-attention.

The SD1.5 UNet's largest attentions run at N=4096 tokens (64×64 latents,
d=40) — materializing the (N,N) probability matrix costs ~0.5 GB of HBM
traffic per layer per step at CFG batch 2 (SURVEY.md §7 stage 4 calls for
exactly this kernel). This kernel streams K/V tiles through VMEM with the
classic online-softmax recurrence, so HBM traffic is O(N·d) instead of
O(N²).

Forward = Pallas; backward = custom_vjp that recomputes attention with
plain XLA ops (training steps are dominated by conv FLOPs, inference by
the forward).

Shapes: q, k, v (B, H, N, D); D may be non-128-aligned (40/80/160) — Mosaic
pads lanes internally; block sizes are chosen so everything fits VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, seq_k):
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, D)
    block_q, d = q.shape

    acc = jnp.zeros((block_q, d), jnp.float32)
    m = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((block_q, 1), jnp.float32)

    def body(i, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    acc, m, l = jax.lax.fori_loop(0, seq_k // block_k, body, (acc, m, l))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, block_q=256, block_k=512):
    b, h, n, d = q.shape
    nk = k.shape[2]
    block_q = min(block_q, n)
    block_k = min(block_k, nk)
    if n % block_q or nk % block_k:
        raise ValueError(f"seq lengths ({n},{nk}) not divisible by blocks")

    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, nk, d)
    vf = v.reshape(b * h, nk, d)

    kernel = functools.partial(
        _flash_fwd_kernel, scale=scale, block_k=block_k, seq_k=nk
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        grid=(b * h, n // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
    )(qf, kf, vf)
    return out.reshape(b, h, n, d)


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
    # recompute-based backward in plain XLA (correct and simple; the
    # training hot path is conv-dominated so this is not the bottleneck)
    q, k, v = res

    def f(q, k, v):
        _, o = _xla_attention_f32(q, k, v, scale)
        return o

    _, vjp = jax.vjp(f, q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
