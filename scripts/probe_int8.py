"""Measure whether XLA:TPU reaches the v5e int8 MXU path, and its speedup
over bf16, for the op shapes that dominate the try-on pipeline
(BASELINE.md round-2 device profile: convs 50% of device time).

Probe rules (CLAUDE.md, hard-won):
- operands are generated ON DEVICE inside jit — never transferred through
  the axon tunnel;
- each timed program chains enough MXU work (~100+ ms) that the ~30 ms
  tunnel dispatch floor and scan overheads are noise;
- the chain carries a data dependency through every iteration so XLA
  cannot hoist the matmul/conv out of the loop;
- bf16 and int8 run through the IDENTICAL harness — the ratio is the
  signal even if absolute numbers carry tunnel overhead. The int8 chain
  includes the int32→int8 requantize step, so the measured ratio already
  pays the requant cost a real W8A8 network would pay.

Usage: python scripts/probe_int8.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edgestyle_tpu.utils.profiling import timeit

L = 16  # chain length per dispatch


def matmul_probe(n=8192):
    flops = 2.0 * n * n * n * L

    @jax.jit
    def bf16(seed):
        k = jax.random.key(seed)
        a = jax.random.normal(k, (n, n), jnp.bfloat16)
        b = jax.random.normal(k, (n, n), jnp.bfloat16)

        def body(c, _):
            c = (a + c) @ b
            return c * 1e-4, ()

        c, _ = lax.scan(body, jnp.zeros((n, n), jnp.bfloat16), None, length=L)
        return c[0, 0]

    t16 = timeit(bf16, 0, iters=5)

    @jax.jit
    def int8(seed):
        k = jax.random.key(seed)
        a = jax.random.randint(k, (n, n), -127, 128, jnp.int8)
        b = jax.random.randint(k, (n, n), -127, 128, jnp.int8)

        def body(c, _):
            d = lax.dot(a + c, b, preferred_element_type=jnp.int32)
            return (d >> 16).astype(jnp.int8), ()

        c, _ = lax.scan(body, jnp.zeros((n, n), jnp.int8), None, length=L)
        return c[0, 0]

    t8 = timeit(int8, 0, iters=5)
    print(
        f"matmul {n}^2 x{L}: bf16 {t16*1e3:.1f} ms ({flops/t16/1e12:.1f} TF/s)  "
        f"int8 {t8*1e3:.1f} ms ({flops/t8/1e12:.1f} TOP/s)  "
        f"speedup {t16/t8:.2f}x",
        flush=True,
    )


def conv_probe(b=32, hw=64, c=320, k=3):
    flops = 2.0 * b * hw * hw * k * k * c * c * L
    dn = lax.conv_dimension_numbers(
        (b, hw, hw, c), (k, k, c, c), ("NHWC", "HWIO", "NHWC")
    )
    conv = functools.partial(
        lax.conv_general_dilated, window_strides=(1, 1), padding="SAME",
        dimension_numbers=dn,
    )

    @jax.jit
    def bf16(seed):
        key = jax.random.key(seed)
        x = jax.random.normal(key, (b, hw, hw, c), jnp.bfloat16)
        w = jax.random.normal(key, (k, k, c, c), jnp.bfloat16) * 0.05

        def body(cx, _):
            return conv(cx, w).astype(jnp.bfloat16) * 0.05, ()

        cx, _ = lax.scan(body, x, None, length=L)
        return cx[0, 0, 0, 0]

    t16 = timeit(bf16, 0, iters=5)

    @jax.jit
    def int8(seed):
        key = jax.random.key(seed)
        x = jax.random.randint(key, (b, hw, hw, c), -127, 128, jnp.int8)
        w = jax.random.randint(key, (k, k, c, c), -127, 128, jnp.int8)

        def body(cx, _):
            d = conv(cx, w, preferred_element_type=jnp.int32)
            return (d >> 16).astype(jnp.int8), ()

        cx, _ = lax.scan(body, x, None, length=L)
        return cx[0, 0, 0, 0]

    t8 = timeit(int8, 0, iters=5)
    print(
        f"conv B{b} {hw}x{hw} {c}ch {k}x{k} x{L}: "
        f"bf16 {t16*1e3:.1f} ms ({flops/t16/1e12:.1f} TF/s)  "
        f"int8 {t8*1e3:.1f} ms ({flops/t8/1e12:.1f} TOP/s)  "
        f"speedup {t16/t8:.2f}x",
        flush=True,
    )


def attn_probe(bh=16, s=4096, d=128):
    """Attention-shaped matmul pair (QK^T then PV) at the pipeline's
    largest self-attention geometry (64x64 tokens, head dim padded to 128
    lanes like ops/flash.py does). The int8-vs-bf16 ratio here bounds what
    an int8 flash-attention kernel could win on the MXU portion of the
    25%-of-device-time attention category (VERDICT r3 item 5)."""
    flops = 2.0 * bh * s * s * d * 2 * L

    @jax.jit
    def bf16(seed):
        key = jax.random.key(seed)
        q = jax.random.normal(key, (bh, s, d), jnp.bfloat16)
        k = jax.random.normal(key, (bh, s, d), jnp.bfloat16)
        v = jax.random.normal(key, (bh, s, d), jnp.bfloat16)

        def body(c, _):
            p = jnp.einsum("bsd,btd->bst", q + c[:, :1], k)
            o = jnp.einsum("bst,btd->bsd", p, v) * 1e-4
            return o.astype(jnp.bfloat16), ()

        o, _ = lax.scan(body, jnp.zeros((bh, s, d), jnp.bfloat16), None, length=L)
        return o[0, 0, 0]

    t16 = timeit(bf16, 0, iters=5)

    @jax.jit
    def int8(seed):
        key = jax.random.key(seed)
        q = jax.random.randint(key, (bh, s, d), -127, 128, jnp.int8)
        k = jax.random.randint(key, (bh, s, d), -127, 128, jnp.int8)
        v = jax.random.randint(key, (bh, s, d), -127, 128, jnp.int8)

        def body(c, _):
            p = jnp.einsum("bsd,btd->bst", q + c[:, :1], k,
                           preferred_element_type=jnp.int32)
            p8 = (p >> 8).astype(jnp.int8)  # the requant a real kernel pays
            o = jnp.einsum("bst,btd->bsd", p8, v,
                           preferred_element_type=jnp.int32)
            return (o >> 16).astype(jnp.int8), ()

        o, _ = lax.scan(body, jnp.zeros((bh, s, d), jnp.int8), None, length=L)
        return o[0, 0, 0]

    t8 = timeit(int8, 0, iters=5)
    print(
        f"attn bh{bh} s{s} d{d} x{L}: "
        f"bf16 {t16*1e3:.1f} ms ({flops/t16/1e12:.1f} TF/s)  "
        f"int8 {t8*1e3:.1f} ms ({flops/t8/1e12:.1f} TOP/s)  "
        f"speedup {t16/t8:.2f}x",
        flush=True,
    )


if __name__ == "__main__":
    print(jax.default_backend(), jax.devices(), flush=True)
    matmul_probe()
    conv_probe()
    conv_probe(b=32, hw=32, c=640)
    attn_probe()
    attn_probe(bh=16, s=1024, d=128)
