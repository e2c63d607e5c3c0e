"""SD1.5 UNet2DConditionModel + ControlNet family, NHWC JAX.

The reference's compute core is diffusers' UNet2DConditionModel driven with
`down_block_additional_residuals` / `mid_block_additional_residual`
(/root/reference/train_text2image_pretrained_openpose.py:1234-1240,
model/edgestyle_pipeline.py:500-510) and a family of ControlNets:

  * plain ControlNet (frozen openpose branch, train...py:734-737)
  * CachedControlNetModel — skips the cond-embedding conv when the cond is
    already a precomputed 320-ch embedding (model/controllora.py:199-203)
  * ControlLoRA — trunk weight-tied to the UNet + LoRA adapters on every
    linear in the tied subtree (model/controllora.py:529-593,623-632), with
    a VAE conditioning embedding whose conv is the UNet's conv_in
    (model/controllora.py:28-43)

TPU-first design decisions:
  * One module class implements both the UNet and the ControlNet trunk with
    identical submodule names, so ControlLoRA weight tying is literal param
    subtree sharing — no name translation, no copies (the arrays are the
    same buffers inside jit).
  * LoRA is merged into the trunk kernels inside jit before the forward
    (W + down@up); at SD1.5 sizes the merge matmul is ~50x cheaper than
    applying LoRA as two extra matmuls per token batch.
  * Residual injection, CFG, and the scheduler all live in one jitted
    program; everything here is shape-static.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.ops.tome import ToMeConfig
from edgestyle_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_heads: int = 8
    norm_eps: float = 1e-5
    # which down blocks carry cross-attention transformers (SD1.5: all but last)
    # conditioning embedding channels for plain ControlNets
    cond_embedding_channels: Tuple[int, ...] = (16, 32, 96, 256)
    conditioning_channels: int = 3

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def sd15(self):
        return self


class DownBlock(nn.Module):
    """CrossAttnDownBlock2D / DownBlock2D: N resnets (+transformers),
    optional stride-2 downsampler. Returns (hidden, skips)."""

    out_channels: int
    num_layers: int
    num_heads: int
    with_attn: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    tome: Optional[ToMeConfig] = None

    @nn.compact
    def __call__(self, x, temb, context, run_downsample: bool = True):
        skips = []
        for j in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{j}")(x, temb)
            if self.with_attn:
                x = Transformer2D(
                    self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
                    tome=self.tome, name=f"attentions_{j}",
                )(x, context)
            skips.append(x)
        # run_downsample=False serves SD15UNet.shallow_forward, whose cached
        # deep levels never consume the downsampled skip
        if self.add_downsample and run_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class MidBlock(nn.Module):
    """UNetMidBlock2DCrossAttn: resnet, transformer, resnet."""

    channels: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    tome: Optional[ToMeConfig] = None

    @nn.compact
    def __call__(self, x, temb, context):
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_0")(x, temb)
        x = Transformer2D(
            self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
            tome=self.tome, name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(self.channels, dtype=self.dtype, name="resnets_1")(x, temb)
        return x


class UpBlock(nn.Module):
    """UpBlock2D / CrossAttnUpBlock2D: 3 resnets each consuming a skip."""

    out_channels: int
    num_layers: int
    num_heads: int
    with_attn: bool
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    tome: Optional[ToMeConfig] = None

    @nn.compact
    def __call__(self, x, skips, temb, context):
        for j in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype, name=f"resnets_{j}")(x, temb)
            if self.with_attn:
                x = Transformer2D(
                    self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
                    tome=self.tome, name=f"attentions_{j}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x


class CondEmbedding(nn.Module):
    """ControlNet conditioning embedding: 3→16→32→96→256 conv stack with
    stride-2 between channel jumps, zero-initialised 3x3 output conv to 320."""

    channels: Tuple[int, ...]
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond):
        ch = self.channels
        x = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name="conv_in")(cond)
        x = jax.nn.silu(x)
        for i in range(len(ch) - 1):
            x = nn.Conv(ch[i], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"blocks_{2*i}")(x)
            x = jax.nn.silu(x)
            x = nn.Conv(
                ch[i + 1], (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=f"blocks_{2*i+1}",
            )(x)
            x = jax.nn.silu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_out",
        )(x)
        return x


class SD15UNet(nn.Module):
    """The UNet. `controlnet_mode` turns the same trunk into a ControlNet:
    up-path modules are skipped, zero-conv heads are added, and the call
    signature gains a conditioning embedding."""

    cfg: UNetConfig = UNetConfig()
    controlnet_mode: bool = False
    cond_embedding_type: str = "conv"  # "conv" | "latent" (VAE/ControlLoRA)
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "auto"
    # opt-in ToMe token merging in the transformer blocks (ops/tome.py;
    # param-free, checkpoints unaffected). None = exact.
    tome: Optional[ToMeConfig] = None

    def setup(self):
        cfg = self.cfg
        chs = cfg.block_out_channels
        self.conv_in = nn.Conv(
            chs[0], (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
        )
        self.time_embedding = TimestepEmbedding(cfg.time_embed_dim, self.dtype)

        down = []
        for i, ch in enumerate(chs):
            down.append(
                DownBlock(
                    out_channels=ch,
                    num_layers=cfg.layers_per_block,
                    num_heads=cfg.num_heads,
                    with_attn=i < len(chs) - 1,
                    add_downsample=i < len(chs) - 1,
                    dtype=self.dtype,
                    attn_impl=self.attn_impl,
                    tome=self.tome,
                )
            )
        self.down_blocks = down
        self.mid_block = MidBlock(
            chs[-1], cfg.num_heads, self.dtype, self.attn_impl, self.tome
        )

        if self.controlnet_mode:
            if self.cond_embedding_type == "conv":
                self.controlnet_cond_embedding = CondEmbedding(
                    cfg.cond_embedding_channels, chs[0], self.dtype
                )
            # 12 zero-conv heads + mid head
            n_skips = 1 + sum(
                cfg.layers_per_block + (1 if i < len(chs) - 1 else 0)
                for i in range(len(chs))
            )
            zero = lambda c: nn.Conv(
                c, (1, 1), kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, dtype=self.dtype,
            )
            skip_chs = self.skip_channels()
            self.controlnet_down_blocks = [zero(skip_chs[k]) for k in range(n_skips)]
            self.controlnet_mid_block = zero(chs[-1])
        else:
            ups = []
            rev = tuple(reversed(chs))
            for i, ch in enumerate(rev):
                ups.append(
                    UpBlock(
                        out_channels=ch,
                        num_layers=cfg.layers_per_block + 1,
                        num_heads=cfg.num_heads,
                        with_attn=i > 0,
                        add_upsample=i < len(rev) - 1,
                        dtype=self.dtype,
                        attn_impl=self.attn_impl,
                        tome=self.tome,
                    )
                )
            self.up_blocks = ups
            self.conv_norm_out = GroupNorm(num_groups=32, eps=self.cfg.norm_eps, act="silu")
            self.conv_out = nn.Conv(
                cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
            )

    def skip_channels(self):
        cfg = self.cfg
        chs = cfg.block_out_channels
        out = [chs[0]]
        for i, ch in enumerate(chs):
            out += [ch] * cfg.layers_per_block
            if i < len(chs) - 1:
                out.append(ch)
        return out

    def _trunk(self, sample, timesteps, context, cond_embedding=None):
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = self.time_embedding(temb.astype(self.dtype))

        x = self.conv_in(sample.astype(self.dtype))
        if cond_embedding is not None:
            x = x + cond_embedding
        skips = [x]
        for blk in self.down_blocks:
            x, s = blk(x, temb, context.astype(self.dtype))
            skips += s
        x = self.mid_block(x, temb, context.astype(self.dtype))
        return x, skips, temb

    def __call__(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        down_block_additional_residuals: Optional[Sequence[jax.Array]] = None,
        mid_block_additional_residual: Optional[jax.Array] = None,
        return_deep: bool = False,
    ) -> jax.Array:
        """Full forward. With ``return_deep`` also returns the input to the
        last up block (the highest-resolution deep feature) so callers can
        splice it back in via :meth:`shallow_forward` on later denoise steps
        (DeepCache-style serving approximation — see shallow_forward)."""
        if self.controlnet_mode:
            raise ValueError("use controlnet_forward / apply with method=")
        x, skips, temb = self._trunk(sample, timesteps, encoder_hidden_states)
        if down_block_additional_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_additional_residuals)]
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual
        ctx = encoder_hidden_states.astype(self.dtype)
        deep = None
        for bi, blk in enumerate(self.up_blocks):
            if bi == len(self.up_blocks) - 1:
                deep = x
            n = blk.num_layers
            blk_skips, skips = skips[-n:], skips[:-n]
            x = blk(x, blk_skips, temb, ctx)
        x = self.conv_norm_out(x)
        x = self.conv_out(x)
        out = x.astype(jnp.float32)
        return (out, deep) if return_deep else out

    def shallow_forward(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        deep_feature: jax.Array,
        down_block_additional_residuals: Optional[Sequence[jax.Array]] = None,
    ) -> jax.Array:
        """DeepCache-style shallow re-evaluation (opt-in serving
        approximation; NOT a reference feature). Recomputes only the
        highest-resolution level — conv_in, down_blocks[0] (minus its
        downsampler) and up_blocks[-1] — splicing in ``deep_feature``, the
        input to the last up block captured by a full forward
        (``return_deep=True``) at an earlier denoise step. The deep levels
        (down_blocks[1:], mid_block, up_blocks[:-1]) and their residual
        injections stay frozen at the capture step; only the level where
        step-to-step change concentrates tracks the current sample
        (DeepCache, arXiv:2312.00858; A-SDM's feature inheritance,
        PAPERS.md). Consumes only the first 1+layers_per_block entries of
        ``down_block_additional_residuals`` — the deeper residuals were
        baked into ``deep_feature`` at capture time.

        Exactness property (tested): with ``deep_feature`` captured at the
        SAME (sample, t), this returns bit-identical output to __call__."""
        if self.controlnet_mode:
            raise ValueError("shallow_forward is a UNet path, not a ControlNet one")
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = self.time_embedding(temb.astype(self.dtype))
        ctx = encoder_hidden_states.astype(self.dtype)
        x = self.conv_in(sample.astype(self.dtype))
        skips = [x]
        _, s = self.down_blocks[0](x, temb, ctx, run_downsample=False)
        skips += s
        if down_block_additional_residuals is not None:
            skips = [sk + r for sk, r in zip(skips, down_block_additional_residuals)]
        blk = self.up_blocks[-1]
        x = blk(deep_feature.astype(self.dtype), skips, temb, ctx)
        x = self.conv_norm_out(x)
        x = self.conv_out(x)
        return x.astype(jnp.float32)

    def embed_cond(self, cond: jax.Array) -> jax.Array:
        """Raw conditioning image (B,512,512,3) → 320-ch 64x64 embedding.
        For cond_embedding_type='latent' the caller embeds via the VAE and
        conv_in (see ControlLoRA helpers); this path is the conv stack."""
        if self.cond_embedding_type != "conv":
            raise ValueError("latent-type cond is embedded via VAE + conv_in")
        return self.controlnet_cond_embedding(cond.astype(self.dtype))

    def controlnet_forward(
        self,
        sample: jax.Array,
        timesteps: jax.Array,
        encoder_hidden_states: jax.Array,
        cond_embedding: jax.Array,
        conditioning_scale: float | jax.Array = 1.0,
        guess_mode: bool = False,
    ):
        """ControlNet branch forward. `cond_embedding` is the precomputed
        320-ch embedding (CachedControlNetModel semantics,
        /root/reference/model/controllora.py:199-203 — the pipeline embeds
        once, not per denoise step). Returns (down_residuals, mid_residual)."""
        x, skips, _ = self._trunk(
            sample, timesteps, encoder_hidden_states, cond_embedding=cond_embedding
        )
        down_res = [
            zb(s) for zb, s in zip(self.controlnet_down_blocks, skips)
        ]
        mid_res = self.controlnet_mid_block(x)
        if guess_mode:
            scales = jnp.logspace(-1, 0, len(down_res) + 1) * conditioning_scale
            down_res = [r * s for r, s in zip(down_res, scales[:-1])]
            mid_res = mid_res * scales[-1]
        else:
            down_res = [r * conditioning_scale for r in down_res]
            mid_res = mid_res * conditioning_scale
        return tuple(down_res), mid_res


# --------------------------------------------------------------------------
# LoRA overlay (ControlLoRA): merge W + down@up into trunk linear kernels.
# --------------------------------------------------------------------------

# Linear param paths inside the tied trunk that receive LoRA adapters —
# every nn.Linear under down_blocks/mid_block/time_embedding, mirroring the
# reference's blanket injection over _skip_layers
# (/root/reference/model/controllora.py:529-593).
LORA_LINEAR_LEAF_NAMES = ("to_q", "to_k", "to_v", "to_out", "proj_in", "proj_out",
                          "time_emb_proj", "linear_1", "linear_2", "fc1", "fc2")


def is_lora_linear_path(path: Tuple[str, ...]) -> bool:
    """LoRA targets: linear kernels in attention/ff/time-emb inside the
    trunk (the reference recipe runs lora_conv2d_rank=0; conv kernels are
    covered separately by :func:`is_lora_conv_path`)."""
    if not path or path[-1] != "kernel":
        return False
    top = path[0]
    if not (top.startswith("down_blocks_") or top == "mid_block" or top == "time_embedding"):
        return False
    leaf_module = path[-2]
    # GEGLU ff proj_in/proj_out are Dense; Transformer2D proj_in/proj_out are
    # 1x1 convs (4-D kernels) — distinguished by ndim at init time instead.
    return any(leaf_module == n or leaf_module.startswith(n) for n in LORA_LINEAR_LEAF_NAMES)


def is_lora_conv_path(path: Tuple[str, ...]) -> bool:
    """Conv-LoRA targets when lora_conv2d_rank>0: EVERY conv kernel in the
    tied trunk — the reference injects LoRAConv2dLayer into every
    LoRACompatibleConv in _skip_layers (controllora.py:561-575)."""
    if not path or path[-1] != "kernel":
        return False
    top = path[0]
    return top == "conv_in" or top.startswith("down_blocks_") or top == "mid_block"


def init_lora_params(rng, trunk_params: Dict, rank: int, conv_rank: int = 0) -> Dict:
    """Create {path: {'down', 'up'}} adapters. Linears: down (in,r),
    up (r,out), down ~ N(0, 1/rank) (diffusers LoRALinearLayer init),
    up = 0. When ``conv_rank > 0``, every trunk conv kernel also gets an
    adapter: down (kh,kw,in,r) (a full-kernel conv to r channels), up
    (r,out) (the 1x1 follow-up) — NOTE the reference quirk that the conv
    adapters' rank is the LINEAR rank; ``conv_rank`` only gates
    (controllora.py:561-569 passes rank=lora_linear_rank)."""
    flat = _flatten_tree(trunk_params)
    lora = {}
    keys = jax.random.split(rng, max(len(flat), 1))
    i = 0
    for path, leaf in flat.items():
        nd = getattr(leaf, "ndim", 0)
        if is_lora_linear_path(path) and nd == 2:
            din, dout = leaf.shape
            lora[path] = {
                "down": jax.random.normal(keys[i], (din, rank), jnp.float32) / rank,
                "up": jnp.zeros((rank, dout), jnp.float32),
            }
            i += 1
        elif conv_rank > 0 and nd == 4 and is_lora_conv_path(path):
            kh, kw, din, dout = leaf.shape
            lora[path] = {
                "down": jax.random.normal(keys[i], (kh, kw, din, rank),
                                          jnp.float32) / rank,
                "up": jnp.zeros((rank, dout), jnp.float32),
            }
            i += 1
    return _unflatten_tree(lora)


def merge_lora(trunk_params: Dict, lora_params: Dict, scale: float = 1.0) -> Dict:
    """Return trunk params with kernel ← kernel + scale·(down∘up). Linear:
    down@up; conv: einsum('hwir,ro->hwio') — exactly the composition of
    diffusers LoRAConv2dLayer's k×k down conv and 1x1 up conv. Runs inside
    jit; untouched leaves are passed through by reference."""
    flat_lora = _flatten_tree(lora_params, stop_at={"down", "up"})

    flat_trunk = _flatten_tree(trunk_params)
    merged = dict(flat_trunk)
    for path, lp in flat_lora.items():
        base = flat_trunk[path]
        if lp["down"].ndim == 4:
            delta = jnp.einsum("hwir,ro->hwio", lp["down"], lp["up"]) * scale
        else:
            delta = (lp["down"] @ lp["up"]) * scale
        merged[path] = (base + delta.astype(base.dtype))
    return _unflatten_tree(merged)


def _flatten_tree(tree, prefix=(), stop_at=None):
    out = {}
    for k, v in tree.items():
        p = prefix + (k,)
        if isinstance(v, dict):
            if stop_at and set(v.keys()) == set(stop_at):
                out[p] = v
            else:
                out.update(_flatten_tree(v, p, stop_at))
        else:
            out[p] = v
    return out


def _unflatten_tree(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


TRUNK_KEYS = ("conv_in", "time_embedding", "mid_block")  # + down_blocks_* prefix


def split_trunk_params(unet_params: Dict) -> Dict:
    """Extract the subtree a ControlLoRA ties to (reference _skip_layers,
    /root/reference/model/controllora.py:443-450)."""
    out = {}
    for k, v in unet_params.items():
        if k in TRUNK_KEYS or k.startswith("down_blocks_"):
            out[k] = v
    return out


def controllora_params(
    unet_params: Dict, lora_params: Dict, head_params: Dict, lora_scale: float = 1.0
) -> Dict:
    """Assemble a ControlNet param tree for a ControlLoRA branch:
    tied trunk (+ merged LoRA) + its own zero-conv heads. `head_params`
    holds controlnet_down_blocks_* / controlnet_mid_block."""
    trunk = split_trunk_params(unet_params)
    merged = merge_lora(trunk, lora_params, lora_scale) if lora_params else dict(trunk)
    merged.update(head_params)
    return merged


# --------------------------------------------------------------------------
# Weight porting: diffusers UNet2DConditionModel / ControlNetModel
# state dicts → SD15UNet params (SURVEY.md §2.6 checkpoints:
# SG161222/Realistic_Vision_V5.1_noVAE UNet, lllyasviel openpose ControlNet).
# --------------------------------------------------------------------------

def _map_transformer(m, tp: str, fp: str):
    m.norm(tp + r"\.norm", fp + ".norm")
    m.conv(tp + r"\.proj_in", fp + ".proj_in")
    m.conv(tp + r"\.proj_out", fp + ".proj_out")
    for b in range(4):  # depth 1 for SD1.5; extra rules simply never fire
        bp = tp + rf"\.transformer_blocks\.{b}"
        fq = fp + f".blocks_{b}"
        for norm in ("norm1", "norm2", "norm3"):
            m.norm(bp + rf"\.{norm}", fq + f".{norm}")
        for attn in ("attn1", "attn2"):
            for proj in ("to_q", "to_k", "to_v"):
                m.linear(bp + rf"\.{attn}\.{proj}", fq + f".{attn}.{proj}")
            m.linear(bp + rf"\.{attn}\.to_out\.0", fq + f".{attn}.to_out")
        m.linear(bp + r"\.ff\.net\.0\.proj", fq + ".ff.proj_in")
        m.linear(bp + r"\.ff\.net\.2", fq + ".ff.proj_out")


def _map_unet_resnet(m, tp: str, fp: str):
    m.norm(tp + r"\.norm1", fp + ".norm1")
    m.norm(tp + r"\.norm2", fp + ".norm2")
    m.conv(tp + r"\.conv1", fp + ".conv1")
    m.conv(tp + r"\.conv2", fp + ".conv2")
    m.conv(tp + r"\.conv_shortcut", fp + ".conv_shortcut")
    m.linear(tp + r"\.time_emb_proj", fp + ".time_emb_proj")


def _unet_common_mapper(m):
    m.conv(r"conv_in", "conv_in")
    m.linear(r"time_embedding\.linear_1", "time_embedding.linear_1")
    m.linear(r"time_embedding\.linear_2", "time_embedding.linear_2")
    for i in range(4):
        for j in range(3):
            _map_unet_resnet(m, rf"down_blocks\.{i}\.resnets\.{j}", f"down_blocks_{i}.resnets_{j}")
            _map_transformer(m, rf"down_blocks\.{i}\.attentions\.{j}", f"down_blocks_{i}.attentions_{j}")
        m.conv(rf"down_blocks\.{i}\.downsamplers\.0\.conv", f"down_blocks_{i}.downsamplers_0.conv")
    _map_unet_resnet(m, r"mid_block\.resnets\.0", "mid_block.resnets_0")
    _map_unet_resnet(m, r"mid_block\.resnets\.1", "mid_block.resnets_1")
    _map_transformer(m, r"mid_block\.attentions\.0", "mid_block.attentions_0")
    return m


def port_unet_state_dict(sd):
    """diffusers UNet2DConditionModel → flat {path: array}."""
    from edgestyle_tpu.core.porting import KeyMapper

    m = _unet_common_mapper(KeyMapper())
    for i in range(4):
        for j in range(3):
            _map_unet_resnet(m, rf"up_blocks\.{i}\.resnets\.{j}", f"up_blocks_{i}.resnets_{j}")
            _map_transformer(m, rf"up_blocks\.{i}\.attentions\.{j}", f"up_blocks_{i}.attentions_{j}")
        m.conv(rf"up_blocks\.{i}\.upsamplers\.0\.conv", f"up_blocks_{i}.upsamplers_0.conv")
    m.norm(r"conv_norm_out", "conv_norm_out")
    m.conv(r"conv_out", "conv_out")
    return m.apply(sd)


def port_controlnet_state_dict(sd):
    """diffusers ControlNetModel → flat {path: array} for controlnet_mode."""
    from edgestyle_tpu.core.porting import KeyMapper

    m = _unet_common_mapper(KeyMapper())
    m.conv(r"controlnet_cond_embedding\.conv_in", "controlnet_cond_embedding.conv_in")
    for k in range(6):
        m.conv(
            rf"controlnet_cond_embedding\.blocks\.{k}",
            f"controlnet_cond_embedding.blocks_{k}",
        )
    m.conv(r"controlnet_cond_embedding\.conv_out", "controlnet_cond_embedding.conv_out")
    for k in range(12):
        m.conv(rf"controlnet_down_blocks\.{k}", f"controlnet_down_blocks_{k}")
    m.conv(r"controlnet_mid_block", "controlnet_mid_block")
    return m.apply(sd)
