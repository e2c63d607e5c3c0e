"""MultiControlNet fusion tests: torch parity for the grouped-conv fusion
block (interleave order + group assignment are easy to get silently wrong)
and an end-to-end 6-branch orchestration test on the tiny UNet config."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.multicontrolnet import (
    CONTROLNET_PATTERN,
    ControlNetFusionBlock,
    EdgeStyleMultiControlNet,
    interleave_residuals,
    pattern_groups,
)
from edgestyle_tpu.models.unet import (
    SD15UNet,
    init_lora_params,
    controllora_params,
    split_trunk_params,
)
from tests.test_layers import to_nchw, to_nhwc
from tests.test_unet import TINY


def test_interleave_matches_torch_reference(rng):
    tensors = [rng.standard_normal((2, 3, 4, 4), dtype=np.float32) for _ in range(6)]
    # reference: stack dim=1, permute(0,2,1,3,4), view(B,-1,H,W)
    stacked = torch.stack([torch.from_numpy(t) for t in tensors], dim=1)
    ref = stacked.permute(0, 2, 1, 3, 4).contiguous().view(2, -1, 4, 4).numpy()

    ours = interleave_residuals([jnp.asarray(to_nhwc(t)) for t in tensors])
    np.testing.assert_array_equal(to_nchw(ours), ref)


class TorchControlNetBlock(torch.nn.Module):
    """Reference ControlNetBlock op-sequence (edgestyle_multicontrolnet.py:23-63)."""

    def __init__(self, c, size, n):
        super().__init__()
        self.first_conv = torch.nn.Conv2d(c * n, c * n // 2, 1, groups=c * n // 2)
        self.first_normalization = torch.nn.LayerNorm([c * n // 2, *size])
        self.second_conv = torch.nn.Conv2d(c * n // 2, c, 1, groups=c)
        self.second_normalization = torch.nn.LayerNorm([c, *size])
        self.third_conv = torch.nn.Conv2d(c, c, 1, groups=c)

    def forward(self, x):
        x = torch.nn.functional.silu(self.first_normalization(self.first_conv(x)))
        x = torch.nn.functional.silu(self.second_normalization(self.second_conv(x)))
        return self.third_conv(x)


def port_fusion_block(tmod):
    sd = porting.load_torch_state_dict(tmod)
    m = porting.KeyMapper()
    for conv in ("first_conv", "second_conv", "third_conv"):
        m.conv(conv, conv)
    for ln in ("first_normalization", "second_normalization"):
        m.rule(ln + r"\.weight", ln + ".scale", lambda w: np.transpose(w, (1, 2, 0)))
        m.rule(ln + r"\.bias", ln + ".bias", lambda w: np.transpose(w, (1, 2, 0)))
    return porting.unflatten(m.apply(sd))


def test_fusion_block_matches_torch(rng):
    c, n, size = 8, 6, (4, 4)
    torch.manual_seed(0)
    tmod = TorchControlNetBlock(c, size, n).eval()
    x = rng.standard_normal((2, c * n, *size), dtype=np.float32)
    with torch.no_grad():
        ref = tmod(torch.from_numpy(x)).numpy()

    mod = ControlNetFusionBlock(channels=c, num_nets=n)
    params = port_fusion_block(tmod)
    out = mod.apply({"params": params}, jnp.asarray(to_nhwc(x)))
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-5)


def test_pattern_groups():
    groups = pattern_groups(CONTROLNET_PATTERN)
    by_key = {g.params_key: g.positions for g in groups}
    assert by_key == {"static": (1, 3, 5), "lora_0": (0,), "lora_1": (2, 4)}


def test_six_branch_forward_tiny(rng):
    mcn = EdgeStyleMultiControlNet(TINY, attn_impl="xla")
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4), dtype=np.float32))
    t = jnp.array([5], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 24), dtype=np.float32))
    embs = [
        jnp.asarray(rng.standard_normal((1, 16, 16, 32), dtype=np.float32))
        for _ in range(6)
    ]

    # params: one UNet provides the tied trunk; two lora instances; one static
    unet = SD15UNet(TINY, attn_impl="xla")
    uparams = unet.init(
        jax.random.key(0), x, t, ctx
    )["params"]
    cn = mcn.branch
    cparams = cn.init(
        jax.random.key(1), x, t, ctx, embs[0], method="controlnet_forward"
    )["params"]
    heads = {k: v for k, v in cparams.items() if k.startswith("controlnet_")}
    trunk = split_trunk_params(uparams)
    lora0 = init_lora_params(jax.random.key(2), trunk, 4)
    lora1 = init_lora_params(jax.random.key(3), trunk, 4)
    params = {
        "static": cparams,
        "lora_0": controllora_params(uparams, lora0, heads),
        "lora_1": controllora_params(uparams, lora1, heads),
        "fusion": mcn.init_fusion(jax.random.key(4), sample_hw=(16, 16)),
    }

    down, mid = jax.jit(
        lambda p, x, t, ctx, embs: mcn(p, x, t, ctx, embs)
    )(params, x, t, ctx, embs)
    assert len(down) == 4
    assert down[0].shape == (1, 16, 16, 32)
    assert mid.shape == (1, 8, 8, 64)
    for r in list(down) + [mid]:
        assert np.isfinite(np.asarray(r)).all()
