"""Flash-attention kernel correctness vs the XLA reference, in interpret
mode on CPU (real-TPU timing is covered by bench/verify): forward, lse,
and the two-pass Pallas backward."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import edgestyle_tpu.ops.flash as flash_mod
from edgestyle_tpu.ops.attention import _xla_attention


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


@pytest.mark.parametrize("n,d,h", [(512, 40, 2), (1024, 80, 1), (512, 64, 2)])
def test_flash_matches_xla(rng, n, d, h):
    b = 2
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = 1.0 / d**0.5
    ref = _xla_attention(q, k, v, scale)
    out = flash_mod._flash_forward(q, k, v, scale, block_q=128, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_lse_correct(rng):
    b, h, n, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = 0.17
    out, lse = flash_mod._flash_forward(q, q, q, scale, block_q=128, block_k=128,
                                        return_lse=True)
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(q)) * scale
    ref_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse), ref_lse, atol=1e-4)


def test_flash_bf16_io(rng):
    b, h, n, d = 1, 2, 256, 40
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    q, k, v = mk(), mk(), mk()
    out = flash_mod._flash_forward(q, k, v, 0.158, block_q=128, block_k=128)
    assert out.dtype == jnp.bfloat16
    ref = _xla_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                         v.astype(jnp.float32), 0.158)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref), atol=0.04)


def test_flash_pallas_backward_matches_xla(rng):
    b, h, n, d = 1, 2, 256, 32
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = 1.0 / d**0.5

    f_flash = lambda q, k, v: jnp.sum(flash_mod.flash_attention(q, k, v, scale) ** 2)
    f_ref = lambda q, k, v: jnp.sum(_xla_attention(q, k, v, scale) ** 2)
    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4,
                                   err_msg=f"d{name}")


def test_flash_backward_padded_head_dim(rng):
    # d=40 pads to 128 lanes; gradients in the padding must not leak
    b, h, n, d = 1, 1, 256, 40
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    scale = 0.158
    f_flash = lambda q, k, v: jnp.sum(flash_mod.flash_attention(q, k, v, scale) * 0.3)
    f_ref = lambda q, k, v: jnp.sum(_xla_attention(q, k, v, scale) * 0.3)
    g1 = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs mosaic lowering")
def test_flash_boundary_no_layout_transposes():
    """Regression guard for the round-1 'raw device arrays 10x slower'
    finding. scripts/flash_boundary.py (round 2, real chip) showed raw and
    compiler-produced operands time IDENTICALLY (427.7 vs 430.2 ms single
    dispatch — the round-1 gap was a tunnel wall-clock artifact) and the
    optimized HLO for raw params contains zero transposes and only a
    handful of copies. Pin that: a layout regression would reintroduce
    transposes/mass copies at the custom-call boundary."""
    from edgestyle_tpu.ops.flash import flash_attention

    q = jnp.zeros((2, 8, 1024, 40), jnp.bfloat16)
    f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=0.158))
    hlo = f.lower(q, q, q).compile().as_text()
    assert hlo.count(" transpose(") == 0
    assert hlo.count(" copy(") <= 6
