"""EfficientViT b-series backbone + classification / segmentation heads.

Completes the vendored-efficientvit inventory (SURVEY.md §2.4): the
reference tree carries the b0–b3 backbone family and SegHead/ClsHead
(efficientvit/models/efficientvit/{backbone.py:37-160, seg.py:34-106,
cls.py:28-51}) even though EdgeStyle itself only exercises the l2 SAM
path; rebuilt here so the framework covers the full model zoo surface.

b-series differences from the large backbone: DSConv stem blocks, MBConv
conv stages (expand 4, no fewer-norm), EfficientViTBlocks in stages 3 AND
4, hswish activations.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.models.efficientvit.ops import (
    ConvLayer,
    DSConv,
    EfficientViTBlock,
    MBConv,
)


@dataclasses.dataclass(frozen=True)
class BBackboneConfig:
    width_list: Tuple[int, ...] = (8, 16, 32, 64, 128)
    depth_list: Tuple[int, ...] = (1, 2, 2, 2, 2)
    dim: int = 16
    expand_ratio: float = 4
    act: str = "hswish"


B0 = BBackboneConfig()
B1 = BBackboneConfig(width_list=(16, 32, 64, 128, 256), depth_list=(1, 2, 3, 3, 4), dim=16)
B2 = BBackboneConfig(width_list=(24, 48, 96, 192, 384), depth_list=(1, 3, 4, 4, 6), dim=32)
B3 = BBackboneConfig(width_list=(32, 64, 128, 256, 512), depth_list=(1, 4, 6, 6, 9), dim=32)


class EfficientViTBackbone(nn.Module):
    """b-series (reference backbone.py:37-160)."""

    cfg: BBackboneConfig = B1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        cfg = self.cfg
        w, d = cfg.width_list, cfg.depth_list
        act = cfg.act
        out = {"input": x}

        x = ConvLayer(w[0], 3, 2, norm="bn", act=act, dtype=self.dtype, name="stem_in")(x)
        for j in range(d[0]):
            x = x + DSConv(
                w[0], 1, use_bias=(False, False), norm=("bn", "bn"), act=(act, None),
                dtype=self.dtype, name=f"stem_{j}",
            )(x)
        out["stage0"] = x

        for sid in (1, 2):
            for j in range(d[sid]):
                stride = 2 if j == 0 else 1
                blk = MBConv(
                    w[sid], stride, expand_ratio=cfg.expand_ratio,
                    norm=("bn",) * 3, act=(act, act, None),
                    dtype=self.dtype, name=f"stage{sid}_block_{j}",
                )
                x = blk(x) if stride == 2 else x + blk(x)
            out[f"stage{sid}"] = x

        for sid in (3, 4):
            x = MBConv(
                w[sid], 2, expand_ratio=cfg.expand_ratio,
                use_bias=(True, True, False), norm=(None, None, "bn"),
                act=(act, act, None), dtype=self.dtype, name=f"stage{sid}_down",
            )(x)
            for j in range(d[sid]):
                x = EfficientViTBlock(
                    dim=cfg.dim, expand_ratio=cfg.expand_ratio, act=act,
                    dtype=self.dtype, name=f"stage{sid}_vit_{j}",
                )(x)
            out[f"stage{sid}"] = x
        out["stage_final"] = x
        return out


class ClsHead(nn.Module):
    """1x1 conv widen → pool → dense head (reference cls.py:28-51)."""

    width: int = 1024
    num_classes: int = 1000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]):
        x = feats["stage_final"]
        x = ConvLayer(self.width, 1, norm="bn", act="hswish", dtype=self.dtype, name="conv")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.width * 2 if False else self.width, dtype=self.dtype, name="fc1")(x)
        from edgestyle_tpu.models.layers import LayerNorm

        x = LayerNorm(name="norm")(x)
        x = jax.nn.hard_swish(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class SegHead(nn.Module):
    """Multi-scale fusion segmentation head (reference seg.py:34-106):
    stage4/3/2 → 1x1 conv → upsample → add → MBConv middles → classes."""

    head_width: int = 64
    head_depth: int = 3
    num_classes: int = 19
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]):
        target = feats["stage2"].shape[1:3]
        merged = None
        for fid in ("stage4", "stage3", "stage2"):
            y = ConvLayer(self.head_width, 1, norm="bn", act=None,
                          dtype=self.dtype, name=f"input_{fid}")(feats[fid])
            # torch-exact bicubic, matching the reference UpSampleLayer
            # (ops/resize.py — see SamNeck note)
            from edgestyle_tpu.ops.resize import torch_bicubic_resize

            y = torch_bicubic_resize(y, tuple(target))
            merged = y if merged is None else merged + y
        x = merged
        for j in range(self.head_depth):
            x = x + MBConv(
                self.head_width, expand_ratio=4, norm=("bn",) * 3,
                act=("hswish", "hswish", None), dtype=self.dtype, name=f"middle_{j}",
            )(x)
        return ConvLayer(
            self.num_classes, 1, use_bias=True, norm=None, act=None,
            dtype=self.dtype, name="out",
        )(x)
