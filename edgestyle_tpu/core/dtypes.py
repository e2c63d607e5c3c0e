"""Dtype policy for the framework.

Two blessed modes:
  * fp32 reference  — numerics-parity mode used by golden tests.
  * bf16 fast path  — params stay fp32, activations/matmuls run bf16 on the
    MXU; norm statistics and softmax accumulate in fp32.

This replaces the reference's torch autocast usage (e.g. the forced-fp32
LiteMLA region, /root/reference/efficientvit/models/nn/ops.py:397-402):
instead of a context manager we thread an explicit policy into each module.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # dtype used for numerically sensitive reductions (norm stats, softmax,
    # linear-attention normalizers) regardless of compute_dtype.
    accum_dtype: jnp.dtype = jnp.float32

    @property
    def is_fast(self) -> bool:
        return self.compute_dtype == jnp.bfloat16


FP32 = DTypePolicy()
BF16 = DTypePolicy(compute_dtype=jnp.bfloat16)


def default_policy(fast: bool = False) -> DTypePolicy:
    return BF16 if fast else FP32
