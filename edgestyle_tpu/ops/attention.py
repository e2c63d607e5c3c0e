"""Attention ops.

The reference runs attention through diffusers' AttnProcessor (torch SDPA)
inside the UNet's Transformer2D blocks and the VAE mid-block
(SURVEY.md §2.1/§7 stage 4). Here it is a single function with two
implementations:

  * ``xla``    — einsum + fp32 softmax; XLA fuses this well and it is the
                 correctness reference.
  * ``pallas`` — fused flash-attention kernel (edgestyle_tpu.ops.flash) for
                 the UNet's 4096/1024/256/64-token self-attentions; tiled
                 for the MXU, O(N) VMEM.

All shapes are static; sequence lengths in SD1.5 are {4096,1024,256,64}
spatial and 77 text tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, scale):
    # q: (B, H, Nq, D), k/v: (B, H, Nk, D)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
    return out


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    impl: str = "auto",
) -> jax.Array:
    """Multi-head attention over flattened token axes.

    q: (B, Nq, C); k, v: (B, Nk, C). Returns (B, Nq, C).
    """
    b, nq, c = q.shape
    nk = k.shape[1]
    d = c // num_heads
    scale = 1.0 / (d**0.5)

    qh = q.reshape(b, nq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nk, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nk, num_heads, d).transpose(0, 2, 1, 3)

    if impl == "auto":
        impl = _pick_impl(nq, nk, d)

    if impl == "pallas":
        from edgestyle_tpu.ops.flash import flash_attention

        out = flash_attention(qh, kh, vh, scale=scale)
    else:
        out = _xla_attention(qh, kh, vh, scale)

    return out.transpose(0, 2, 1, 3).reshape(b, nq, c)


def _pick_impl(nq: int, nk: int, d: int) -> str:
    """Flash is the default for the long spatial self-attentions: measured
    end-to-end 0.665 vs 0.271 images/sec on the full 6-branch try-on
    (2.45×) — the N≥1024 attentions are bandwidth-bound in XLA. Opt out
    with EDGESTYLE_FLASH=0 (e.g. for parity debugging)."""
    import os

    if os.environ.get("EDGESTYLE_FLASH", "1") == "0":
        return "xla"
    try:
        from edgestyle_tpu.ops import flash  # noqa: F401
    except Exception:  # pragma: no cover
        return "xla"
    if jax.default_backend() == "tpu" and nq >= 1024 and nq == nk and d % 8 == 0:
        return "pallas"
    return "xla"
