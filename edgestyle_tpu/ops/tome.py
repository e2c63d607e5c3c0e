"""ToMe-SD token merging for the UNet/ControlNet transformer blocks.

Token Merging for Stable Diffusion (Bolya & Hoffman, arXiv:2303.17604):
before the self-attention of a transformer block, merge the ``r`` most
redundant spatial tokens into their most-similar neighbours, run the
block's expensive inner computation on the reduced ``N - r`` tokens, and
unmerge (broadcast results back to the source positions) afterwards. At
SD1.5's 64×64 level (N=4096 tokens) a 0.5 ratio quarters the attention
FLOPs and halves the projections with near-unchanged outputs, because
adjacent latent tokens are highly correlated.

This is NOT a reference feature (the torch reference runs plain
attention, model/controllora.py / diffusers UNet); it is an opt-in
TPU-serving lever like the cache intervals. Design choices vs the
original torch implementation, made for XLA's static-shape world:

* Bipartite soft matching with a STRIDED 2×2 destination grid
  (the tomesd generator default, ``use_rand=False`` variant): dst = the
  top-left token of every 2×2 tile, src = the other three. Deterministic,
  no host RNG, jit-stable.
* ``r`` is static (computed from the static token count at trace time),
  so every intermediate has a static shape; ranking uses one argsort and
  batched ``take_along_axis`` gathers.
* The scatter-mean of merged src tokens into their dst is expressed as a
  one-hot einsum (MXU-friendly at these sizes) instead of a serial
  scatter-add.

The merge/unmerge pair is exact for duplicate tokens (merging i into an
identical j loses nothing) and the whole feature is a no-op at
``ratio=0`` — the transformer block code path is then byte-identical to
the unmerged program.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ToMeConfig:
    """Static (trace-time) token-merging policy.

    ratio:      fraction of the level's N tokens to merge (capped at the
                src-partition size, 3N/4). tomesd default 0.5.
    min_tokens: apply only where the token count is >= this — 4096
                restricts merging to the 64×64 level, the tomesd
                ``max_downsample=1`` default (deeper levels are cheap and
                less redundant).
    merge_mlp:  also run the GEGLU feed-forward on merged tokens
                (tomesd ``merge_mlp``; default off — the FF is fused
                matmul work the MXU handles well, and quality is more
                sensitive to it).
    """

    ratio: float = 0.5
    min_tokens: int = 4096
    merge_mlp: bool = False

    def applies(self, num_tokens: int) -> bool:
        return self.ratio > 0.0 and num_tokens >= self.min_tokens


def _dst_src_indices(h: int, w: int, sy: int = 2, sx: int = 2):
    """Static partition of the h*w token grid: dst = top-left of each
    sy×sx tile, src = the rest (row-major flat indices)."""
    idx = np.arange(h * w).reshape(h, w)
    dst_mask = np.zeros((h, w), bool)
    dst_mask[::sy, ::sx] = True
    dst = idx[dst_mask].ravel()
    src = idx[~dst_mask].ravel()
    return jnp.asarray(dst, jnp.int32), jnp.asarray(src, jnp.int32)


def build_merge(
    metric: jax.Array, h: int, w: int, r: int
) -> Tuple[Callable, Callable, int]:
    """Compute a (merge, unmerge) closure pair from similarity of
    ``metric`` (B, N, C), N == h*w.

    merge(x):   (B, N, C) → (B, N - r, C) — the kept src tokens followed
                by the dst tokens with their merged srcs averaged in.
    unmerge(y): (B, N - r, C) → (B, N, C) — dst tokens return to their
                grid positions; each merged src position receives its
                dst's value; kept src positions receive their own.
    Returns (merge, unmerge, r_effective).
    """
    b, n, c = metric.shape
    assert n == h * w, (n, h, w)
    dst_idx, src_idx = _dst_src_indices(h, w)
    n_dst, n_src = dst_idx.shape[0], src_idx.shape[0]
    r = max(0, min(int(r), n_src))
    if r == 0:
        return (lambda x: x), (lambda y: y), 0

    # matching math in bf16: cosine ranking only needs ~2 significant
    # digits, and the (n_src × n_dst × C) score matmul + scatter einsum
    # are the expensive parts of the whole feature (device trace,
    # BASELINE.md "ToMe")
    m = metric.astype(jnp.bfloat16)
    m = m / (jnp.linalg.norm(m.astype(jnp.float32), axis=-1, keepdims=True)
             + 1e-6).astype(jnp.bfloat16)
    a = jnp.take(m, src_idx, axis=1)  # (B, n_src, C)
    bm = jnp.take(m, dst_idx, axis=1)  # (B, n_dst, C)
    scores = jnp.einsum(
        "bsc,bdc->bsd", a, bm, preferred_element_type=jnp.float32
    )  # cosine similarity
    node_max = jnp.max(scores, axis=-1)  # (B, n_src)
    node_idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)  # best dst

    # most-similar src tokens merge; argsort descending is a static perm
    order = jnp.argsort(-node_max, axis=-1).astype(jnp.int32)  # (B, n_src)
    merged_src = order[:, :r]  # positions (into src partition) that merge
    kept_src = order[:, r:]
    inv_order = jnp.argsort(order, axis=-1).astype(jnp.int32)
    dst_assign = jnp.take_along_axis(node_idx, merged_src, axis=1)  # (B, r)
    # one-hot (B, r, n_dst) for the scatter-mean einsum
    counts = jnp.sum(
        jax.nn.one_hot(dst_assign, n_dst, dtype=jnp.float32), axis=1
    )  # (B, n_dst)

    def merge(x: jax.Array) -> jax.Array:
        x_src = jnp.take(x, src_idx, axis=1)
        x_dst = jnp.take(x, dst_idx, axis=1).astype(jnp.float32)
        kept = jnp.take_along_axis(x_src, kept_src[..., None], axis=1)
        merged = jnp.take_along_axis(x_src, merged_src[..., None], axis=1)
        # values stay in the input dtype (bf16 in the production pipeline,
        # fp32 in parity tests — keeps the identical-token roundtrip exact
        # there) with fp32 accumulation
        dst_sum = jnp.einsum(
            "brc,brd->bdc", merged,
            jax.nn.one_hot(dst_assign, n_dst, dtype=merged.dtype),
            preferred_element_type=jnp.float32,
        )
        x_dst = (x_dst + dst_sum) / (1.0 + counts)[..., None]
        return jnp.concatenate(
            [kept, x_dst.astype(x.dtype)], axis=1
        )

    # unmerge as ONE value gather: precompute, per token position, the row
    # of the merged sequence that holds its value (dst rows live at
    # n_src - r + d; a merged src reads its dst's row, a kept src reads
    # its kept slot). Value scatters of (B, N, C) arrays cost real device
    # time (they lower to copies); an int32 index scatter + single gather
    # does not.
    merged_mask = inv_order < r  # (B, n_src): src token merged?
    src_rows = jnp.where(
        merged_mask, (n_src - r) + node_idx, jnp.maximum(inv_order - r, 0)
    ).astype(jnp.int32)
    rows = jnp.zeros((b, n), jnp.int32)
    rows = rows.at[:, dst_idx].set(
        (n_src - r) + jnp.arange(n_dst, dtype=jnp.int32)[None]
    )
    rows = rows.at[:, src_idx].set(src_rows)

    def unmerge(y: jax.Array) -> jax.Array:
        return jnp.take_along_axis(y, rows[..., None], axis=1)

    return merge, unmerge, r
