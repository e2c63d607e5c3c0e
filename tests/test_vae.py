"""VAE tests: shape/jit correctness of the full autoencoder at tiny size,
plus a full torch-parity test of a down-scaled encoder/decoder built from
the same torch blocks as test_layers (guards the stacked-port path +
asymmetric downsample padding)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.vae import AutoencoderKL, VAEConfig, port_vae_state_dict

from tests.test_layers import TorchResnetBlock, TorchVaeAttention, to_nchw, to_nhwc


def small_cfg():
    return VAEConfig(block_out_channels=(32, 64), layers_per_block=2, sample_size=32)


def test_vae_roundtrip_shapes_and_jit(rng):
    cfg = small_cfg()
    vae = AutoencoderKL(cfg)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3), dtype=np.float32))
    params = vae.init(jax.random.key(0), x)
    z = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))(params, x)
    assert z.shape == (1, 16, 16, 4)  # one downsample for 2 stages
    out = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(params, z)
    assert out.shape == x.shape

    # stochastic encode differs from mode
    zs = vae.apply(params, x, jax.random.key(1), method=vae.encode)
    assert not np.allclose(np.asarray(zs), np.asarray(z))


class TorchMiniVAE(torch.nn.Module):
    """diffusers AutoencoderKL op-sequence at (32,64) width: conv_in →
    [2×resnet + asym downsample] × stages → mid(res,attn,res) → GN/silu →
    conv_out → quant_conv; decoder mirrored with 3 resnets per stage and
    nearest-2x upsample."""

    def __init__(self):
        super().__init__()
        chs = (32, 64)
        self.enc_conv_in = torch.nn.Conv2d(3, 32, 3, padding=1)
        self.enc_blocks = torch.nn.ModuleList()
        for i, c in enumerate(chs):
            cin = chs[max(i - 1, 0)]
            self.enc_blocks.append(
                torch.nn.ModuleList(
                    [TorchResnetBlock(cin, c, eps=1e-6), TorchResnetBlock(c, c, eps=1e-6)]
                )
            )
        self.enc_down = torch.nn.Conv2d(32, 32, 3, stride=2, padding=0)
        self.enc_mid1 = TorchResnetBlock(64, 64, eps=1e-6)
        self.enc_attn = TorchVaeAttention(64)
        self.enc_mid2 = TorchResnetBlock(64, 64, eps=1e-6)
        self.enc_norm_out = torch.nn.GroupNorm(32, 64, eps=1e-6)
        self.enc_conv_out = torch.nn.Conv2d(64, 8, 3, padding=1)
        self.quant_conv = torch.nn.Conv2d(8, 8, 1)

        self.post_quant_conv = torch.nn.Conv2d(4, 4, 1)
        self.dec_conv_in = torch.nn.Conv2d(4, 64, 3, padding=1)
        self.dec_mid1 = TorchResnetBlock(64, 64, eps=1e-6)
        self.dec_attn = TorchVaeAttention(64)
        self.dec_mid2 = TorchResnetBlock(64, 64, eps=1e-6)
        rev = (64, 32)
        self.dec_blocks = torch.nn.ModuleList()
        for i, c in enumerate(rev):
            cin = rev[max(i - 1, 0)]
            self.dec_blocks.append(
                torch.nn.ModuleList(
                    [
                        TorchResnetBlock(cin, c, eps=1e-6),
                        TorchResnetBlock(c, c, eps=1e-6),
                        TorchResnetBlock(c, c, eps=1e-6),
                    ]
                )
            )
        self.dec_up = torch.nn.Conv2d(64, 64, 3, padding=1)
        self.dec_norm_out = torch.nn.GroupNorm(32, 32, eps=1e-6)
        self.dec_conv_out = torch.nn.Conv2d(32, 3, 3, padding=1)

    def encode(self, x):
        h = self.enc_conv_in(x)
        for i, blocks in enumerate(self.enc_blocks):
            for b in blocks:
                h = b(h)
            if i == 0:
                h = self.enc_down(F.pad(h, (0, 1, 0, 1)))
        h = self.enc_mid2(self.enc_attn(self.enc_mid1(h)))
        h = self.enc_conv_out(F.silu(self.enc_norm_out(h)))
        return self.quant_conv(h)

    def decode(self, z):
        h = self.dec_conv_in(self.post_quant_conv(z))
        h = self.dec_mid2(self.dec_attn(self.dec_mid1(h)))
        for i, blocks in enumerate(self.dec_blocks):
            for b in blocks:
                h = b(h)
            if i == 0:
                h = self.dec_up(F.interpolate(h, scale_factor=2, mode="nearest"))
        return self.dec_conv_out(F.silu(self.dec_norm_out(h)))


def port_mini_vae(tmod):
    sd = porting.load_torch_state_dict(tmod)
    # rename the torch mini-VAE keys into the diffusers layout that
    # port_vae_state_dict expects (only 2 stages present)
    ren = {}
    for k, v in sd.items():
        nk = (
            k.replace("enc_conv_in", "encoder.conv_in")
            .replace("enc_down", "encoder.down_blocks.0.downsamplers.0.conv")
            .replace("enc_mid1", "encoder.mid_block.resnets.0")
            .replace("enc_mid2", "encoder.mid_block.resnets.1")
            .replace("enc_attn", "encoder.mid_block.attentions.0")
            .replace("enc_norm_out", "encoder.conv_norm_out")
            .replace("enc_conv_out", "encoder.conv_out")
            .replace("dec_conv_in", "decoder.conv_in")
            .replace("dec_up", "decoder.up_blocks.0.upsamplers.0.conv")
            .replace("dec_mid1", "decoder.mid_block.resnets.0")
            .replace("dec_mid2", "decoder.mid_block.resnets.1")
            .replace("dec_attn", "decoder.mid_block.attentions.0")
            .replace("dec_norm_out", "decoder.conv_norm_out")
            .replace("dec_conv_out", "decoder.conv_out")
        )
        for i in range(2):
            for j in range(3):
                nk = nk.replace(
                    f"enc_blocks.{i}.{j}.", f"encoder.down_blocks.{i}.resnets.{j}."
                ).replace(f"dec_blocks.{i}.{j}.", f"decoder.up_blocks.{i}.resnets.{j}.")
        # HF attention to_out is a list ["0"]
        if "attentions.0.to_out." in nk:
            nk = nk.replace("to_out.", "to_out.0.")
        ren[nk] = v
    flat = port_vae_state_dict_small(ren)
    return porting.unflatten(flat)


def port_vae_state_dict_small(sd):
    # reuse the real mapper; it covers indices up to 4/3 so 2-stage subset works
    return port_vae_state_dict(sd)


def test_mini_vae_parity_with_torch(rng):
    torch.manual_seed(0)
    tmod = TorchMiniVAE().eval()
    x = rng.standard_normal((1, 3, 32, 32), dtype=np.float32)
    with torch.no_grad():
        ref_moments = tmod.encode(torch.from_numpy(x)).numpy()
        ref_dec = tmod.decode(torch.from_numpy(ref_moments[:, :4])).numpy()

    cfg = small_cfg()
    vae = AutoencoderKL(cfg)
    params = {"params": port_mini_vae(tmod)}
    mean, logvar = vae.apply(params, jnp.asarray(to_nhwc(x)), method=vae.encode_moments)
    moments = np.concatenate([to_nchw(mean), to_nchw(logvar)], axis=1)
    np.testing.assert_allclose(moments, np.concatenate(
        [ref_moments[:, :4], np.clip(ref_moments[:, 4:], -30, 20)], axis=1
    ), atol=2e-4)

    dec = vae.apply(params, jnp.asarray(to_nhwc(ref_moments[:, :4])), method=vae.decode)
    np.testing.assert_allclose(to_nchw(dec), ref_dec, atol=2e-4)
