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
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        cfg = self.cfg
        w, d = cfg.width_list, cfg.depth_list
        act = cfg.act
        out = {"input": x}

        x = ConvLayer(w[0], 3, 2, norm="bn", act=act, norm_eps=self.norm_eps,
                      dtype=self.dtype, name="stem_in")(x)
        for j in range(d[0]):
            x = x + DSConv(
                w[0], 1, use_bias=(False, False), norm=("bn", "bn"), act=(act, None),
                norm_eps=self.norm_eps, dtype=self.dtype, name=f"stem_{j}",
            )(x)
        out["stage0"] = x

        for sid in (1, 2):
            for j in range(d[sid]):
                stride = 2 if j == 0 else 1
                blk = MBConv(
                    w[sid], stride, expand_ratio=cfg.expand_ratio,
                    norm=("bn",) * 3, act=(act, act, None),
                    norm_eps=self.norm_eps, dtype=self.dtype,
                    name=f"stage{sid}_block_{j}",
                )
                x = blk(x) if stride == 2 else x + blk(x)
            out[f"stage{sid}"] = x

        for sid in (3, 4):
            x = MBConv(
                w[sid], 2, expand_ratio=cfg.expand_ratio,
                use_bias=(True, True, False), norm=(None, None, "bn"),
                act=(act, act, None), norm_eps=self.norm_eps, dtype=self.dtype,
                name=f"stage{sid}_down",
            )(x)
            for j in range(d[sid]):
                x = EfficientViTBlock(
                    dim=cfg.dim, expand_ratio=cfg.expand_ratio, act=act,
                    norm_eps=self.norm_eps, dtype=self.dtype,
                    name=f"stage{sid}_vit_{j}",
                )(x)
            out[f"stage{sid}"] = x
        out["stage_final"] = x
        return out


class ClsHead(nn.Module):
    """1x1 conv widen → pool → bias-free linear+ln+act → classifier
    (reference cls.py:28-51: ConvLayer(width0) → AdaptiveAvgPool →
    LinearLayer(width0→width1, use_bias=False, norm='ln') →
    LinearLayer(width1→classes, bias)). Builder widths: b0 (1024,1280),
    b1 (1536,1600), b2/b3 (2304,2560), l-series (3072,3200) with gelu."""

    widths: Tuple[int, int] = (1024, 1280)
    num_classes: int = 1000
    act: str = "hswish"
    norm_eps: float = 1e-5  # l-series zoo runs 1e-7 (cls_model_zoo.py:70)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]):
        from edgestyle_tpu.models.efficientvit.ops import act_fn
        from edgestyle_tpu.models.layers import LayerNorm

        x = feats["stage_final"]
        x = ConvLayer(self.widths[0], 1, norm="bn", act=self.act,
                      norm_eps=self.norm_eps, dtype=self.dtype, name="conv")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.Dense(self.widths[1], use_bias=False, dtype=self.dtype,
                     name="fc1")(x)
        x = act_fn(self.act)(LayerNorm(eps=self.norm_eps, name="norm")(x))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc2")(x)


class SegHead(nn.Module):
    """Multi-scale fusion segmentation head (reference seg.py:34-106):
    stage4/3/2 → 1x1 conv → bicubic upsample → add → middle blocks →
    optional final-expand 1x1 conv → classifier conv. The cityscapes
    builders use final_expand=4, the ade20k ones None; l-series heads run
    fmbconv middles with gelu."""

    head_width: int = 64
    head_depth: int = 3
    num_classes: int = 19
    expand_ratio: float = 4
    middle_op: str = "mbconv"  # 'mbconv' (b-series) | 'fmbconv' (l-series)
    final_expand: float | None = 4
    act: str = "hswish"
    norm_eps: float = 1e-5  # l-series zoo runs 1e-7 (seg_model_zoo.py:61)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]):
        from edgestyle_tpu.models.efficientvit.ops import FusedMBConv
        from edgestyle_tpu.ops.resize import torch_bicubic_resize

        target = feats["stage2"].shape[1:3]
        merged = None
        for fid in ("stage4", "stage3", "stage2"):
            y = ConvLayer(self.head_width, 1, norm="bn", act=None,
                          norm_eps=self.norm_eps, dtype=self.dtype,
                          name=f"input_{fid}")(feats[fid])
            # torch-exact bicubic, matching the reference UpSampleLayer
            # (ops/resize.py — see SamNeck note)
            y = torch_bicubic_resize(y, tuple(target))
            merged = y if merged is None else merged + y
        x = merged
        for j in range(self.head_depth):
            if self.middle_op == "mbconv":
                blk = MBConv(
                    self.head_width, expand_ratio=self.expand_ratio,
                    norm=("bn",) * 3, act=(self.act, self.act, None),
                    norm_eps=self.norm_eps, dtype=self.dtype, name=f"middle_{j}",
                )
            else:
                blk = FusedMBConv(
                    self.head_width, expand_ratio=self.expand_ratio,
                    norm=("bn", "bn"), act=(self.act, None),
                    norm_eps=self.norm_eps, dtype=self.dtype, name=f"middle_{j}",
                )
            x = x + blk(x)
        if self.final_expand is not None:
            x = ConvLayer(
                round(self.head_width * self.final_expand), 1, norm="bn",
                act=self.act, norm_eps=self.norm_eps, dtype=self.dtype,
                name="final_expand",
            )(x)
        return ConvLayer(
            self.num_classes, 1, use_bias=True, norm=None, act=None,
            dtype=self.dtype, name="out",
        )(x)


# --------------------------------------------------------------------------
# Weight porting: upstream EfficientViTSeg / EfficientViTCls checkpoints
# (backbone.* + head.* naming, reference seg.py:109-121 / cls.py:55-66) →
# our (backbone_params, head_params) trees. Reuses the ConvLayer/MBConv
# rule helpers from the SAM port mapper.
# --------------------------------------------------------------------------


def _port_b_backbone_rules(m, cfg: BBackboneConfig):
    from edgestyle_tpu.models.efficientvit.sam import _conv_layer, _mb

    d = cfg.depth_list
    B = r"backbone"
    _conv_layer(m, B + r"\.input_stem\.op_list\.0", "backbone.stem_in")
    for j in range(d[0]):
        tp = B + rf"\.input_stem\.op_list\.{j+1}\.main"
        fp = f"backbone.stem_{j}"
        _conv_layer(m, tp + r"\.depth_conv", fp + ".depth_conv")
        _conv_layer(m, tp + r"\.point_conv", fp + ".point_conv")
    for sid in (1, 2):
        for i in range(d[sid]):
            _mb(m, B + rf"\.stages\.{sid-1}\.op_list\.{i}\.main",
                f"backbone.stage{sid}_block_{i}")
    for sid in (3, 4):
        s = sid - 1
        _mb(m, B + rf"\.stages\.{s}\.op_list\.0\.main",
            f"backbone.stage{sid}_down", (False, False, True))
        for i in range(d[sid]):
            tp = B + rf"\.stages\.{s}\.op_list\.{i+1}"
            fp = f"backbone.stage{sid}_vit_{i}"
            _conv_layer(m, tp + r"\.context_module\.main\.qkv",
                        fp + ".context_module.qkv", norm=False)
            m.conv(tp + r"\.context_module\.main\.aggreg\.0\.0",
                   fp + ".context_module.aggreg_0_depth")
            m.conv(tp + r"\.context_module\.main\.aggreg\.0\.1",
                   fp + ".context_module.aggreg_0_point")
            _conv_layer(m, tp + r"\.context_module\.main\.proj",
                        fp + ".context_module.proj")
            _mb(m, tp + r"\.local_module\.main", fp + ".local_module",
                (False, False, True))


def _split_backbone_head(flat):
    from edgestyle_tpu.core.porting import unflatten

    backbone = {k[len("backbone."):]: v for k, v in flat.items()
                if k.startswith("backbone.")}
    head = {k[len("head."):]: v for k, v in flat.items()
            if k.startswith("head.")}
    return unflatten(backbone), unflatten(head)


def port_seg_state_dict(sd, cfg: BBackboneConfig, head_depth: int = 3,
                        final_expand: float | None = 4,
                        middle_op: str = "mbconv"):
    """EfficientViTSeg torch state dict → (backbone_params, head_params)."""
    from edgestyle_tpu.core.porting import KeyMapper
    from edgestyle_tpu.models.efficientvit.sam import _conv_layer, _fmb, _mb

    m = KeyMapper()
    _port_b_backbone_rules(m, cfg)
    for i, fid in enumerate(("stage4", "stage3")):
        _conv_layer(m, rf"head\.input_ops\.{i}\.op_list\.0",
                    f"head.input_{fid}")
    _conv_layer(m, r"head\.input_ops\.2", "head.input_stage2")
    for j in range(head_depth):
        tp = rf"head\.middle\.op_list\.{j}\.main"
        if middle_op == "mbconv":
            _mb(m, tp, f"head.middle_{j}")
        else:
            _fmb(m, tp, f"head.middle_{j}")
    out_idx = 0
    if final_expand is not None:
        _conv_layer(m, r"head\.output_ops\.0\.op_list\.0", "head.final_expand")
        out_idx = 1
    _conv_layer(m, rf"head\.output_ops\.0\.op_list\.{out_idx}", "head.out",
                norm=False)
    return _split_backbone_head(m.apply(sd, strict=True))


def port_cls_state_dict(sd, cfg: BBackboneConfig):
    """EfficientViTCls torch state dict → (backbone_params, head_params)."""
    from edgestyle_tpu.core.porting import KeyMapper
    from edgestyle_tpu.models.efficientvit.sam import _conv_layer

    m = KeyMapper()
    _port_b_backbone_rules(m, cfg)
    _conv_layer(m, r"head\.op_list\.0", "head.conv")
    m.linear(r"head\.op_list\.2\.linear", "head.fc1")
    m.norm(r"head\.op_list\.2\.norm", "head.norm")
    m.linear(r"head\.op_list\.3\.linear", "head.fc2")
    return _split_backbone_head(m.apply(sd, strict=True))
