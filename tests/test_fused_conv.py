"""Fused GN+SiLU+conv3x3 kernel: interpret-mode parity, dispatch rules,
param-tree stability of the rewritten ResnetBlock2D, and gradient flow.

Reference chain: diffusers ResnetBlock2D norm1->silu->conv1 as driven by the
reference trainer (train_text2image_pretrained_openpose.py:1234-1240)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgestyle_tpu.models.layers import ResnetBlock2D
from edgestyle_tpu.ops import fused_conv as fc


def _inputs(rng, b, h, w, cin, cout):
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal(cin), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(cin), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
    return x, gamma, beta, k, bias


@pytest.mark.parametrize(
    "shape",
    [(2, 8, 6, 32, 16, 4), (1, 6, 6, 64, 64, 8), (3, 5, 7, 32, 48, 4)],
)
def test_pallas_matches_reference_interpret(shape):
    b, h, w, cin, cout, groups = shape
    rng = np.random.default_rng(0)
    x, gamma, beta, k, bias = _inputs(rng, b, h, w, cin, cout)
    ref = fc._reference(x, gamma, beta, k, bias, groups, 1e-5, jnp.float32)
    s, t = fc._gn_scale_shift(x, gamma, beta, groups, 1e-5)
    out = fc._pallas_forward(x, s, t, k, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_pallas_cout_tiling_interpret(monkeypatch):
    """Force a small VMEM budget so the Cout axis tiles (nc > 1)."""
    monkeypatch.setattr(fc, "_VMEM_BUDGET", 200 * 1024)
    rng = np.random.default_rng(1)
    b, h, w, cin, cout, groups = 2, 6, 6, 32, 256, 4
    assert fc._pick_cout_tile(h, w, cin, cout, 4) not in (None, cout)
    x, gamma, beta, k, bias = _inputs(rng, b, h, w, cin, cout)
    ref = fc._reference(x, gamma, beta, k, bias, groups, 1e-5, jnp.float32)
    s, t = fc._gn_scale_shift(x, gamma, beta, groups, 1e-5)
    out = fc._pallas_forward(x, s, t, k, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_scale_shift_matches_group_norm():
    """Folded per-(B,C) affine == ops.norms.group_norm to fp rounding."""
    from edgestyle_tpu.ops.norms import group_norm

    rng = np.random.default_rng(2)
    x, gamma, beta, _, _ = _inputs(rng, 2, 8, 8, 64, 64)
    s, t = fc._gn_scale_shift(x, gamma, beta, 32, 1e-5)
    folded = x * s[:, None, None, :] + t[:, None, None, :]
    ref = group_norm(x, gamma, beta, 32, 1e-5)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(ref), atol=1e-5)


def test_dispatch_xla_on_cpu():
    """On the CPU test backend the dispatcher must take the XLA path and
    reproduce the nn.Conv-based composition exactly."""
    assert jax.default_backend() == "cpu"
    rng = np.random.default_rng(3)
    x, gamma, beta, k, bias = _inputs(rng, 1, 8, 8, 32, 32)
    out = fc.norm_act_conv3x3(
        x, gamma, beta, k, bias, num_groups=4, eps=1e-5, dtype=jnp.float32
    )
    ref = fc._reference(x, gamma, beta, k, bias, 4, 1e-5, jnp.float32)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_resnet_block_param_tree_unchanged():
    """The fused rewrite must keep the exact diffusers-port param names and
    shapes (checkpoints depend on them)."""
    block = ResnetBlock2D(64, dtype=jnp.float32)
    x = jnp.zeros((1, 8, 8, 32))
    temb = jnp.zeros((1, 1280))
    params = block.init(jax.random.key(0), x, temb)["params"]
    shapes = jax.tree.map(lambda p: p.shape, params)
    assert shapes == {
        "norm1": {"scale": (32,), "bias": (32,)},
        "conv1": {"kernel": (3, 3, 32, 64), "bias": (64,)},
        "time_emb_proj": {"kernel": (1280, 64), "bias": (64,)},
        "norm2": {"scale": (64,), "bias": (64,)},
        "conv2": {"kernel": (3, 3, 64, 64), "bias": (64,)},
        "conv_shortcut": {"kernel": (1, 1, 32, 64), "bias": (64,)},
    }


def test_custom_vjp_matches_reference_grads():
    """Gradients through the fused op == gradients of the XLA reference
    (the custom VJP re-derives them from the reference composition)."""
    rng = np.random.default_rng(4)
    x, gamma, beta, k, bias = _inputs(rng, 1, 6, 6, 32, 32)
    fc._FORCE_INTERPRET = True
    try:
        def loss_fused(args):
            out = fc._fused(*args, 4, 1e-5, jnp.float32)
            return jnp.sum(out * out)

        def loss_ref(args):
            out = fc._reference(*args, 4, 1e-5, jnp.float32)
            return jnp.sum(out * out)

        args = (x, gamma, beta, k, bias)
        gf = jax.grad(loss_fused)(args)
        gr = jax.grad(loss_ref)(args)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-4)
    finally:
        fc._FORCE_INTERPRET = False


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs mosaic lowering")
def test_pallas_matches_xla_on_chip():
    """Opt-in kernel parity at a real trunk shape on the TPU (bf16): the
    compiled kernel must agree with the XLA chain to bf16 rounding."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 320)), jnp.bfloat16)
    gamma = jnp.asarray(rng.standard_normal(320), jnp.float32)
    beta = jnp.asarray(rng.standard_normal(320), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 320, 320)) * 0.02, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(320), jnp.float32)
    ref = jax.jit(lambda *a: fc._reference(*a, 32, 1e-5, jnp.bfloat16))(
        x, gamma, beta, k, bias)
    out = jax.jit(lambda *a: fc._fused(*a, 32, 1e-5, jnp.bfloat16))(
        x, gamma, beta, k, bias)
    diff = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
    scale = np.abs(np.asarray(ref, np.float32)).max()
    assert diff.max() <= 0.02 * scale
