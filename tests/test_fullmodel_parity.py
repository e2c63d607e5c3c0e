"""Full-model torch-mirror parity (VERDICT r1 item 2).

Round 1 proved per-block parity only; these tests compose the WHOLE
SD1.5 UNet / ControlNet / AutoencoderKL against independent torch mirrors
(tests/torch_sd15.py, written from the diffusers spec) with weights
flowing through the real port mappers — the same code path real
checkpoints take. Two tiers:

  * architecture-complete mid-size configs (4 blocks, real depth, reduced
    widths) — run every suite invocation;
  * real-size SD1.5 (860M-param UNet, 84M VAE) — the heavy tier,
    skippable with EDGESTYLE_SKIP_FULLSIZE=1 for quick local loops.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.unet import (
    SD15UNet,
    UNetConfig,
    port_controlnet_state_dict,
    port_unet_state_dict,
)
from edgestyle_tpu.models.vae import AutoencoderKL, VAEConfig, port_vae_state_dict

from tests import torch_sd15 as T

torch.manual_seed(0)
skip_fullsize = pytest.mark.skipif(
    os.environ.get("EDGESTYLE_SKIP_FULLSIZE") == "1",
    reason="EDGESTYLE_SKIP_FULLSIZE=1",
)


def to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


MID_CFG = dict(block_out_channels=(64, 128, 256, 256), layers_per_block=2,
               cross_attention_dim=96, num_heads=4)
MID_JAX = UNetConfig(**MID_CFG)


def _randomize(tmod):
    """Fan-in-scaled random weights: per-layer gain ~1 at ANY width (flat
    N(0,s²) explodes through the 1280-wide real-size stack), with 1-D
    params (norm scales/biases, conv biases) near 1 so no path carries
    near-zero signal. Zero convs included — parity wants signal everywhere."""
    g = torch.Generator().manual_seed(1234)
    with torch.no_grad():
        for p in tmod.parameters():
            if p.ndim >= 2:
                fan_in = p.shape[1:].numel()
                p.copy_(torch.randn(p.shape, generator=g) / fan_in**0.5)
            else:
                p.copy_(1.0 + 0.25 * torch.randn(p.shape, generator=g))
    return tmod


def _unet_inputs(rng, cfg, hw, b=2):
    lat = rng.standard_normal((b, 4, hw, hw), dtype=np.float32)
    t = np.array([7, 421][:b], np.int64)
    ctx = rng.standard_normal((b, 77, cfg["cross_attention_dim"]), dtype=np.float32)
    return lat, t, ctx


def _run_unet_pair(tcfg, jcfg, hw, rng, residual_test, atol):
    tmod = _randomize(T.UNet2DConditionModel(tcfg)).eval()
    lat, t, ctx = _unet_inputs(rng, tcfg, hw)

    down_res = mid_res = None
    if residual_test:
        skip_chs = SD15UNet(jcfg).skip_channels()
        szs = []
        s = hw
        chs = tcfg["block_out_channels"]
        # skip spatial sizes mirror the down path
        szs.append(s)
        for i, _ in enumerate(chs):
            szs += [s] * tcfg["layers_per_block"]
            if i < len(chs) - 1:
                s //= 2
                szs.append(s)
        down_res = [
            rng.standard_normal((lat.shape[0], c, z, z), dtype=np.float32) * 0.1
            for c, z in zip(skip_chs, szs)
        ]
        mid_res = rng.standard_normal(
            (lat.shape[0], chs[-1], s, s), dtype=np.float32
        ) * 0.1

    with torch.no_grad():
        ref = tmod(
            torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx),
            None if down_res is None else [torch.from_numpy(r) for r in down_res],
            None if mid_res is None else torch.from_numpy(mid_res),
        ).numpy()

    params = porting.unflatten(
        port_unet_state_dict(porting.load_torch_state_dict(tmod))
    )
    jm = SD15UNet(jcfg, attn_impl="xla")
    out = jax.jit(
        lambda p, x, t, c, dr, mr: jm.apply(
            {"params": p}, x, t, c,
            down_block_additional_residuals=dr,
            mid_block_additional_residual=mr,
        )
    )(
        params, jnp.asarray(to_nhwc(lat)), jnp.asarray(t), jnp.asarray(ctx),
        None if down_res is None else [jnp.asarray(to_nhwc(r)) for r in down_res],
        None if mid_res is None else jnp.asarray(to_nhwc(mid_res)),
    )
    got = to_nchw(out)
    # random N(0, 0.2²) weights amplify activations with width, so compare
    # relative to the output's own magnitude (fp32 accumulation noise is
    # ~1e-6 of scale; wiring bugs are O(scale))
    scale = max(1.0, float(np.abs(ref).max()))
    err = np.abs(got - ref).max() / scale
    assert err < atol, f"scaled max diff {err:.2e} (tol {atol}, scale {scale:.3g})"
    assert ref.std() > 0.05, "degenerate reference output"


def test_unet_midsize_full_model(rng):
    _run_unet_pair(MID_CFG, MID_JAX, hw=16, rng=rng, residual_test=False,
                   atol=1e-4)


def test_unet_midsize_with_residuals(rng):
    _run_unet_pair(MID_CFG, MID_JAX, hw=16, rng=rng, residual_test=True,
                   atol=1e-4)


def test_controlnet_midsize_full_model(rng):
    tcfg = MID_CFG
    cond_ch = (16, 32, 64, 64)
    tmod = _randomize(T.ControlNetModel(tcfg, cond_ch)).eval()
    hw = 16
    lat, t, ctx = _unet_inputs(rng, tcfg, hw)
    cond = rng.standard_normal((2, 3, hw * 8, hw * 8), dtype=np.float32)

    with torch.no_grad():
        ref_down, ref_mid = tmod(
            torch.from_numpy(lat), torch.from_numpy(t), torch.from_numpy(ctx),
            torch.from_numpy(cond), scale=0.7,
        )

    jcfg = UNetConfig(**tcfg, cond_embedding_channels=cond_ch)
    jm = SD15UNet(jcfg, controlnet_mode=True, attn_impl="xla")
    params = porting.unflatten(
        port_controlnet_state_dict(porting.load_torch_state_dict(tmod))
    )

    @jax.jit
    def run(p, x, t, c, img):
        emb = jm.apply({"params": p}, img, method="embed_cond")
        return jm.apply(
            {"params": p}, x, t, c, emb, conditioning_scale=0.7,
            method="controlnet_forward",
        )

    down, mid = run(params, jnp.asarray(to_nhwc(lat)), jnp.asarray(t),
                    jnp.asarray(ctx), jnp.asarray(to_nhwc(cond)))
    # the random-weight cond-embedding conv stack amplifies activations to
    # ~4e3, so compare relative to each tensor's own magnitude (observed
    # fp32 accumulation noise ~2e-6 of scale; a wiring/transpose bug
    # produces errors of order the scale itself)
    def close(got, want):
        w = np.asarray(want)
        scale = max(1.0, float(np.abs(w).max()))
        np.testing.assert_allclose(to_nchw(got) / scale, w / scale, atol=1e-4)

    for got, want in zip(down, ref_down):
        close(got, want.numpy())
    close(mid, ref_mid.numpy())


def _run_vae_pair(chs, layers, px, rng, atol):
    tmod = _randomize(T.AutoencoderKL(chs, layers=layers)).eval()
    img = rng.standard_normal((1, 3, px, px), dtype=np.float32)
    with torch.no_grad():
        moments = tmod.encode_moments(torch.from_numpy(img))
        z = moments[:, :4]
        dec = tmod.decode(z).numpy()
        moments = moments.numpy()

    cfg = VAEConfig(block_out_channels=chs, layers_per_block=layers,
                    sample_size=px)
    jm = AutoencoderKL(cfg)
    params = porting.unflatten(port_vae_state_dict(porting.load_torch_state_dict(tmod)))

    got_mean, got_logvar = jax.jit(
        lambda p, x: jm.apply({"params": p}, x, method="encode_moments")
    )(params, jnp.asarray(to_nhwc(img)))
    zc = moments.shape[1] // 2
    np.testing.assert_allclose(to_nchw(got_mean), moments[:, :zc], atol=atol)
    np.testing.assert_allclose(
        to_nchw(got_logvar), np.clip(moments[:, zc:], -30.0, 20.0), atol=atol
    )
    got_d = jax.jit(lambda p, z: jm.apply({"params": p}, z, method="decode"))(
        params, jnp.asarray(to_nhwc(z.numpy()))
    )
    np.testing.assert_allclose(to_nchw(got_d), dec, atol=atol)


def test_vae_midsize_full_model(rng):
    _run_vae_pair((32, 64, 64), layers=2, px=64, rng=rng, atol=5e-4)


# ------------------------------------------------------------- real size
@skip_fullsize
@pytest.mark.heavy
def test_unet_realsize_full_model(rng):
    """The flagship check: 860M-param SD1.5 UNet, real config, 64x64
    latent, controlnet residual injection — fp32 vs the torch mirror."""
    cfg = dict(T.SD15_CFG)
    _run_unet_pair(cfg, UNetConfig(), hw=64, rng=rng, residual_test=True,
                   atol=1e-4)


@skip_fullsize
def test_vae_realsize_full_model(rng):
    _run_vae_pair((128, 256, 512, 512), layers=2, px=256, rng=rng, atol=2e-3)
