"""EfficientViT large backbone (l0/l1/l2) in NHWC JAX.

Structure mirrors /root/reference/efficientvit/models/efficientvit/
backbone.py:203-338 (EfficientViTLargeBackbone): conv stem + ResBlocks,
three FusedMBConv/MBConv conv stages (first block stride-2 expand-16, rest
expand-4 residual; stage 3 uses MBConv with fewer-norm), then an attention
stage of stride-2 MBConv(expand 24) + N EfficientViTBlocks. Returns the
stage feature dict the SAM neck consumes.

l2: widths [32,64,128,256,512], depths [1,2,2,8,8] (backbone.py:359-365);
512px input → stages at 256/128/64/32/16 px.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.models.efficientvit.ops import (
    ConvLayer,
    EfficientViTBlock,
    FusedMBConv,
    MBConv,
    ResBlock,
)


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    width_list: Tuple[int, ...] = (32, 64, 128, 256, 512)
    depth_list: Tuple[int, ...] = (1, 2, 2, 8, 8)
    qkv_dim: int = 32
    act: str = "gelu"


L0 = BackboneConfig(depth_list=(1, 1, 1, 4, 4))
L1 = BackboneConfig(depth_list=(1, 1, 1, 6, 6))
L2 = BackboneConfig(depth_list=(1, 2, 2, 8, 8))
L3 = BackboneConfig(width_list=(64, 128, 256, 512, 1024), depth_list=(1, 2, 2, 8, 8))


class EfficientViTLargeBackbone(nn.Module):
    cfg: BackboneConfig = L2
    norm_eps: float = 1e-5  # reference set_norm_eps (SAM runs 1e-6, l-seg/cls 1e-7)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jax.Array]:
        cfg = self.cfg
        w, d = cfg.width_list, cfg.depth_list
        out: Dict[str, jax.Array] = {"input": x}

        # stage 0: stem + d0 × residual ResBlock(expand 1)
        x = ConvLayer(w[0], 3, 2, norm="bn", act=cfg.act, norm_eps=self.norm_eps,
                      dtype=self.dtype, name="stage0_stem")(x)
        for j in range(d[0]):
            x = x + ResBlock(
                w[0], 1, expand_ratio=1, norm=("bn", "bn"), act=(cfg.act, None),
                norm_eps=self.norm_eps, dtype=self.dtype, name=f"stage0_block_{j}",
            )(x)
        out["stage0"] = x

        # stages 1-3: conv stages; first block stride-2 expand-16 (no
        # residual), remaining d blocks stride-1 expand-4 residual.
        for sid in (1, 2, 3):
            width, depth = w[sid], d[sid]
            fewer = sid > 2
            for j in range(depth + 1):
                stride = 2 if j == 0 else 1
                expand = 16 if stride == 2 else 4
                kw = dict(
                    out_channels=width,
                    stride=stride,
                    expand_ratio=expand,
                    norm_eps=self.norm_eps,
                    dtype=self.dtype,
                )
                if sid <= 2:
                    blk = FusedMBConv(
                        use_bias=(True, False) if fewer else (False, False),
                        norm=(None, "bn") if fewer else ("bn", "bn"),
                        act=(cfg.act, None),
                        name=f"stage{sid}_block_{j}", **kw,
                    )
                else:
                    blk = MBConv(
                        use_bias=(True, True, False) if fewer else (False,) * 3,
                        norm=(None, None, "bn") if fewer else ("bn",) * 3,
                        act=(cfg.act, cfg.act, None),
                        name=f"stage{sid}_block_{j}", **kw,
                    )
                x = blk(x) if stride == 2 else x + blk(x)
            out[f"stage{sid}"] = x

        # stage 4: stride-2 MBConv(expand 24, fewer-norm) + d4 EfficientViTBlocks
        x = MBConv(
            w[4], 2, expand_ratio=24, use_bias=(True, True, False),
            norm=(None, None, "bn"), act=(cfg.act, cfg.act, None),
            norm_eps=self.norm_eps, dtype=self.dtype, name="stage4_block_0",
        )(x)
        for j in range(d[4]):
            x = EfficientViTBlock(
                dim=cfg.qkv_dim, expand_ratio=6, act=cfg.act,
                norm_eps=self.norm_eps, dtype=self.dtype,
                name=f"stage4_vit_{j}",
            )(x)
        out["stage4"] = x
        out["stage_final"] = x
        return out
