"""AutoencoderKL (sd-vae-ft-mse) in NHWC JAX.

The reference loads `stabilityai/sd-vae-ft-mse` via diffusers and uses it
for (a) latent encode of training targets
(/root/reference/train_text2image_pretrained_openpose.py:1163-1165),
(b) the VAE conditioning embedding inside ControlLoRA
(/root/reference/model/controllora.py:28-43), and (c) final decode in the
pipeline (/root/reference/model/edgestyle_pipeline.py:552-557).

Architecture (SD1.5 KL-f8 VAE): 4 encoder stages (128,256,512,512) of two
ResNet blocks + stride-2 downsample (asymmetric (0,1) padding), mid block
with single-head attention, symmetric decoder with three ResNet blocks per
stage and nearest-2x upsampling. GroupNorm eps is 1e-6 throughout.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.core.porting import KeyMapper
from edgestyle_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
    VaeAttentionBlock,
)

SD_VAE_SCALING_FACTOR = 0.18215


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = SD_VAE_SCALING_FACTOR
    sample_size: int = 512


class MidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(self.channels, eps=1e-6, use_time_emb=False, dtype=self.dtype, name="resnet_0")(x)
        x = VaeAttentionBlock(dtype=self.dtype, name="attn")(x)
        x = ResnetBlock2D(self.channels, eps=1e-6, use_time_emb=False, dtype=self.dtype, name="resnet_1")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, eps=1e-6, use_time_emb=False, dtype=self.dtype, name=f"down_{i}_resnet_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, asymmetric_pad=True, dtype=self.dtype, name=f"down_{i}_downsample")(h)
        h = MidBlock(cfg.block_out_channels[-1], dtype=self.dtype, name="mid")(h)
        h = GroupNorm(num_groups=32, eps=1e-6, act="silu", name="conv_norm_out")(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)
        return h


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        rev = tuple(reversed(cfg.block_out_channels))
        h = nn.Conv(rev[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(z)
        h = MidBlock(rev[0], dtype=self.dtype, name="mid")(h)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(ch, eps=1e-6, use_time_emb=False, dtype=self.dtype, name=f"up_{i}_resnet_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample2D(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = GroupNorm(num_groups=32, eps=1e-6, act="silu", name="conv_norm_out")(h)
        h = nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype)
        self.decoder = Decoder(self.cfg, self.dtype)
        self.quant_conv = nn.Conv(2 * self.cfg.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.cfg.latent_channels, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        """x: (B,H,W,3) in [-1,1] → (mean, logvar) each (B,H/8,W/8,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def encode(self, x, rng=None):
        """Sample from the posterior; deterministic (mode) if rng is None.
        Returns *unscaled* latents — callers multiply by cfg.scaling_factor,
        mirroring `vae.encode(...).sample() * scaling_factor` in the
        reference trainer (train_text2image_pretrained_openpose.py:1163)."""
        mean, logvar = self.encode_moments(x)
        if rng is None:
            return mean
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, z):
        """z: (B,h,w,4) *unscaled* latents → image (B,H,W,3)."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode(x, rng)
        return self.decode(z)


def port_vae_state_dict(sd):
    """Map a diffusers AutoencoderKL torch state dict onto AutoencoderKL
    params. Returns the flat {path: array} dict; wrap with
    porting.unflatten to feed flax."""
    m = KeyMapper()
    m.conv(r"quant_conv", "quant_conv")
    m.conv(r"post_quant_conv", "post_quant_conv")
    for side in ("encoder", "decoder"):
        m.conv(rf"{side}\.conv_in", f"{side}.conv_in")
        m.conv(rf"{side}\.conv_out", f"{side}.conv_out")
        m.norm(rf"{side}\.conv_norm_out", f"{side}.conv_norm_out")
        # mid block
        for t_idx, j_idx in (("0", "0"), ("1", "1")):
            p = rf"{side}\.mid_block\.resnets\.{t_idx}"
            q = f"{side}.mid.resnet_{j_idx}"
            _map_resnet(m, p, q)
        mp = rf"{side}\.mid_block\.attentions\.0"
        m.norm(mp + r"\.group_norm", f"{side}.mid.attn.group_norm")
        for proj in ("to_q", "to_k", "to_v"):
            m.linear(mp + rf"\.{proj}", f"{side}.mid.attn.{proj}")
        m.linear(mp + r"\.to_out\.0", f"{side}.mid.attn.to_out")
    # encoder down blocks
    for i in range(4):
        for j in range(2):
            _map_resnet(m, rf"encoder\.down_blocks\.{i}\.resnets\.{j}", f"encoder.down_{i}_resnet_{j}")
        m.conv(
            rf"encoder\.down_blocks\.{i}\.downsamplers\.0\.conv",
            f"encoder.down_{i}_downsample.conv",
        )
    # decoder up blocks
    for i in range(4):
        for j in range(3):
            _map_resnet(m, rf"decoder\.up_blocks\.{i}\.resnets\.{j}", f"decoder.up_{i}_resnet_{j}")
        m.conv(
            rf"decoder\.up_blocks\.{i}\.upsamplers\.0\.conv",
            f"decoder.up_{i}_upsample.conv",
        )
    return m.apply(sd)


def _map_resnet(m: KeyMapper, torch_prefix: str, flax_prefix: str):
    m.norm(torch_prefix + r"\.norm1", flax_prefix + ".norm1")
    m.norm(torch_prefix + r"\.norm2", flax_prefix + ".norm2")
    m.conv(torch_prefix + r"\.conv1", flax_prefix + ".conv1")
    m.conv(torch_prefix + r"\.conv2", flax_prefix + ".conv2")
    m.conv(torch_prefix + r"\.conv_shortcut", flax_prefix + ".conv_shortcut")
