"""Torch-parity tests for the shared NHWC building blocks.

With no diffusers in the image, these tests re-express each diffusers block
in plain torch (the reference's substrate), load identical weights into our
flax modules via the porting layer, and assert numeric agreement. This
guards the NCHW→NHWC transposes and norm/attention numerics.
"""

import flax.linen  # noqa: F401  (import check)
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.layers import (
    GroupNorm,
    ResnetBlock2D,
    Transformer2D,
    VaeAttentionBlock,
    timestep_embedding,
)


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 64, 6, 6), dtype=np.float32)
    gn = torch.nn.GroupNorm(32, 64, eps=1e-5)
    with torch.no_grad():
        gn.weight.copy_(torch.randn(64))
        gn.bias.copy_(torch.randn(64))
        ref = gn(torch.from_numpy(x)).numpy()

    mod = GroupNorm(num_groups=32, eps=1e-5)
    params = {
        "scale": jnp.asarray(gn.weight.detach().numpy()),
        "bias": jnp.asarray(gn.bias.detach().numpy()),
    }
    out = mod.apply({"params": params}, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-5)


def test_norm_fast_stats_matches_two_pass(rng):
    """The bf16 fast path (single-pass E[x²]−E[x]² moments) must agree with
    the two-pass fp32-parity form to well below bf16 quantization, even for
    activations with mean >> std."""
    from edgestyle_tpu.ops import norms

    for shift in (0.0, 5.0, 50.0):
        x = jnp.asarray(
            rng.standard_normal((2, 8, 8, 64)).astype(np.float32) * 0.5 + shift
        ).reshape(2, -1, 32, 2)
        m_fast, v_fast = norms._moments(x, (1, 3), fast=True)
        m_ref, v_ref = norms._moments(x, (1, 3), fast=False)
        np.testing.assert_allclose(np.asarray(m_fast), np.asarray(m_ref), rtol=1e-6)
        # fp32 cancellation grows with (mean/std)²; even at the extreme
        # shift=50 (mean/std=100) it stays ~100× below bf16 input
        # quantization at that ratio
        rtol = 1e-6 if shift == 0.0 else 1e-2
        np.testing.assert_allclose(
            np.asarray(v_fast), np.asarray(v_ref), rtol=rtol, atol=1e-6
        )
    # dispatch: bf16 input takes the fast path, fp32 the parity path
    assert norms._use_fast(jnp.zeros((1,), jnp.bfloat16))
    assert not norms._use_fast(jnp.zeros((1,), jnp.float32))


class TorchResnetBlock(torch.nn.Module):
    """diffusers ResnetBlock2D reproduced in plain torch (same op sequence:
    reference's substrate per SURVEY.md §2.1)."""

    def __init__(self, cin, cout, temb_dim=None, eps=1e-5):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(temb_dim, cout) if temb_dim else None
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = torch.nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if self.time_emb_proj is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


def port_resnet(tmod):
    sd = porting.load_torch_state_dict(tmod)
    m = porting.KeyMapper()
    m.norm(r"norm1", "norm1").norm(r"norm2", "norm2")
    m.conv(r"conv1", "conv1").conv(r"conv2", "conv2").conv(r"conv_shortcut", "conv_shortcut")
    m.linear(r"time_emb_proj", "time_emb_proj")
    return porting.unflatten(m.apply(sd))


def test_resnet_block_matches_torch(rng):
    x = rng.standard_normal((2, 64, 8, 8), dtype=np.float32)
    temb = rng.standard_normal((2, 48), dtype=np.float32)
    tmod = TorchResnetBlock(64, 96, temb_dim=48)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x), torch.from_numpy(temb)).numpy()

    params = port_resnet(tmod)
    mod = ResnetBlock2D(out_channels=96)
    out = mod.apply({"params": params}, jnp.asarray(to_nhwc(x)), jnp.asarray(temb))
    np.testing.assert_allclose(to_nchw(out), ref, atol=2e-5)


class TorchVaeAttention(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.to_q = torch.nn.Linear(c, c)
        self.to_k = torch.nn.Linear(c, c)
        self.to_v = torch.nn.Linear(c, c)
        self.to_out = torch.nn.Linear(c, c)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) / c**0.5, dim=-1)
        out = self.to_out(attn @ v)
        return x + out.transpose(1, 2).reshape(b, c, h, w)


def test_vae_attention_matches_torch(rng):
    c = 64
    x = rng.standard_normal((1, c, 8, 8), dtype=np.float32)
    tmod = TorchVaeAttention(c)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    sd = porting.load_torch_state_dict(tmod)
    m = porting.KeyMapper()
    m.norm(r"group_norm", "group_norm")
    for p in ("to_q", "to_k", "to_v", "to_out"):
        m.linear(p, p)
    params = porting.unflatten(m.apply(sd))
    out = VaeAttentionBlock().apply({"params": params}, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-4)


def test_timestep_embedding_properties():
    emb = timestep_embedding(jnp.array([0.0, 1.0, 999.0]), 320)
    assert emb.shape == (3, 320)
    # t=0: cos half = 1, sin half = 0 (flip_sin_to_cos puts cos first)
    np.testing.assert_allclose(emb[0, :160], np.ones(160), atol=1e-6)
    np.testing.assert_allclose(emb[0, 160:], np.zeros(160), atol=1e-6)


def test_transformer2d_shapes_and_jit(rng):
    mod = Transformer2D(num_heads=4, attn_impl="xla")
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64), dtype=np.float32))
    ctx = jnp.asarray(rng.standard_normal((2, 77, 768), dtype=np.float32))
    params = mod.init(jax.random.key(0), x, ctx)
    out = jax.jit(mod.apply)(params, x, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
