"""EfficientViT model zoo: name→model registries mirroring the reference
entry points (/root/reference/efficientvit/{seg,cls,sam}_model_zoo.py and
the builders in models/efficientvit/{seg.py,cls.py,backbone.py}).

Each ``create_*`` returns ``(model, port_fn)``: a ready flax module and a
function that maps the matching upstream torch checkpoint (state dict, as
loaded by ``core.porting.load_state_dict``) onto the model's param tree.
Norm eps follows the reference runtime (``set_norm_eps``): SAM 1e-6,
l-series seg/cls 1e-7, b-series default 1e-5.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn

from edgestyle_tpu.models.efficientvit.backbone import (
    L0,
    L1,
    L2,
    L3,
    BackboneConfig,
    EfficientViTLargeBackbone,
)
from edgestyle_tpu.models.efficientvit.heads import (
    B0,
    B1,
    B2,
    B3,
    BBackboneConfig,
    ClsHead,
    EfficientViTBackbone,
    SegHead,
    _port_b_backbone_rules,
    _split_backbone_head,
)
from edgestyle_tpu.models.efficientvit.sam import (
    SAM_L0,
    SAM_L1,
    SAM_L2,
    EfficientViTSam,
    port_sam_state_dict,
)


class SegModel(nn.Module):
    """backbone+head assembly (reference EfficientViTSeg/EfficientViTCls,
    seg.py:109-121 / cls.py:55-66); param tree {backbone:…, head:…} matches
    the port mappers directly."""

    backbone: nn.Module
    head: nn.Module

    @nn.compact
    def __call__(self, x):
        return self.head(self.backbone(x))


# name → (backbone cfg, large?) — cls l-series runs the large backbone
_B_BACKBONES: Dict[str, BBackboneConfig] = {"b0": B0, "b1": B1, "b2": B2, "b3": B3}
_L_BACKBONES: Dict[str, BackboneConfig] = {"l0": L0, "l1": L1, "l2": L2, "l3": L3}

# reference seg builder table (seg.py:124-343): dataset → name → head kwargs
SEG_RECIPES: Dict[str, Dict[str, dict]] = {
    "cityscapes": {
        "b0": dict(head_width=32, head_depth=1, expand_ratio=4,
                   middle_op="mbconv", final_expand=4, num_classes=19),
        "b1": dict(head_width=64, head_depth=3, expand_ratio=4,
                   middle_op="mbconv", final_expand=4, num_classes=19),
        "b2": dict(head_width=96, head_depth=3, expand_ratio=4,
                   middle_op="mbconv", final_expand=4, num_classes=19),
        "b3": dict(head_width=128, head_depth=3, expand_ratio=4,
                   middle_op="mbconv", final_expand=4, num_classes=19),
        "l1": dict(head_width=256, head_depth=3, expand_ratio=1,
                   middle_op="fmbconv", final_expand=None, num_classes=19,
                   act="gelu"),
        "l2": dict(head_width=256, head_depth=5, expand_ratio=1,
                   middle_op="fmbconv", final_expand=None, num_classes=19,
                   act="gelu"),
    },
    "ade20k": {
        "b1": dict(head_width=64, head_depth=3, expand_ratio=4,
                   middle_op="mbconv", final_expand=None, num_classes=150),
        "b2": dict(head_width=96, head_depth=3, expand_ratio=4,
                   middle_op="mbconv", final_expand=None, num_classes=150),
        "b3": dict(head_width=128, head_depth=3, expand_ratio=4,
                   middle_op="mbconv", final_expand=None, num_classes=150),
        "l1": dict(head_width=128, head_depth=3, expand_ratio=4,
                   middle_op="fmbconv", final_expand=8, num_classes=150,
                   act="gelu"),
        "l2": dict(head_width=128, head_depth=3, expand_ratio=4,
                   middle_op="fmbconv", final_expand=8, num_classes=150,
                   act="gelu"),
    },
}

# reference cls builder widths (cls.py:55-166)
CLS_RECIPES: Dict[str, dict] = {
    "b0": dict(widths=(1024, 1280)),
    "b1": dict(widths=(1536, 1600)),
    "b2": dict(widths=(2304, 2560)),
    "b3": dict(widths=(2304, 2560)),
    "l1": dict(widths=(3072, 3200), act="gelu"),
    "l2": dict(widths=(3072, 3200), act="gelu"),
    "l3": dict(widths=(6144, 6400), act="gelu"),
}

SAM_CONFIGS = {"l0": SAM_L0, "l1": SAM_L1, "l2": SAM_L2}


def _port_large_seg(cfg: BackboneConfig, head_depth, final_expand, middle_op):
    from edgestyle_tpu.core.porting import KeyMapper
    from edgestyle_tpu.models.efficientvit.sam import (
        _conv_layer,
        _fmb,
        _mb,
        large_backbone_rules,
    )

    def port(sd):
        m = KeyMapper()
        large_backbone_rules(m, cfg.depth_list, r"backbone", "backbone")
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

    return port


def create_seg_model(name: str, dataset: str = "cityscapes",
                     dtype=None) -> Tuple[SegModel, callable]:
    """Reference create_seg_model (seg_model_zoo.py:41-72) without the
    weight download: returns (model, port_fn). Load a checkpoint with
    ``core.porting.load_state_dict(path)`` and apply ``port_fn`` — the
    result is the model's ``params`` tree ({"backbone":…, "head":…})."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    recipes = SEG_RECIPES.get(dataset)
    if recipes is None or name not in recipes:
        known = sorted((d, n) for d, r in SEG_RECIPES.items() for n in r)
        raise ValueError(f"unknown seg model {name!r}/{dataset!r}; zoo: {known}")
    kw = dict(recipes[name])
    num_classes = kw.pop("num_classes")
    eps = 1e-7 if name.startswith("l") else 1e-5  # seg_model_zoo.py:61
    if name in _B_BACKBONES:
        backbone = EfficientViTBackbone(_B_BACKBONES[name], norm_eps=eps,
                                        dtype=dtype)

        def port(sd, _kw=dict(kw)):
            from edgestyle_tpu.models.efficientvit.heads import (
                port_seg_state_dict,
            )

            return port_seg_state_dict(
                sd, _B_BACKBONES[name], head_depth=_kw["head_depth"],
                final_expand=_kw["final_expand"], middle_op=_kw["middle_op"])
    else:
        bcfg = _L_BACKBONES[name]
        backbone = EfficientViTLargeBackbone(bcfg, norm_eps=eps, dtype=dtype)
        port = _port_large_seg(bcfg, kw["head_depth"], kw["final_expand"],
                               kw["middle_op"])
    head = SegHead(num_classes=num_classes, norm_eps=eps, dtype=dtype, **kw)
    return SegModel(backbone, head), port


def create_cls_model(name: str, num_classes: int = 1000,
                     dtype=None) -> Tuple[SegModel, callable]:
    """Reference create_cls_model (cls_model_zoo.py:52-81)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    if name not in CLS_RECIPES:
        raise ValueError(f"unknown cls model {name!r}; zoo: {sorted(CLS_RECIPES)}")
    kw = dict(CLS_RECIPES[name])
    eps = 1e-7 if name.startswith("l") else 1e-5
    if name in _B_BACKBONES:
        backbone = EfficientViTBackbone(_B_BACKBONES[name], norm_eps=eps,
                                        dtype=dtype)

        def port(sd):
            from edgestyle_tpu.models.efficientvit.heads import (
                port_cls_state_dict,
            )

            return port_cls_state_dict(sd, _B_BACKBONES[name])
    else:
        bcfg = _L_BACKBONES[name]
        backbone = EfficientViTLargeBackbone(bcfg, norm_eps=eps, dtype=dtype)

        def port(sd, _bcfg=bcfg):
            from edgestyle_tpu.core.porting import KeyMapper
            from edgestyle_tpu.models.efficientvit.sam import (
                _conv_layer,
                large_backbone_rules,
            )

            m = KeyMapper()
            large_backbone_rules(m, _bcfg.depth_list, r"backbone", "backbone")
            _conv_layer(m, r"head\.op_list\.0", "head.conv")
            m.linear(r"head\.op_list\.2\.linear", "head.fc1")
            m.norm(r"head\.op_list\.2\.norm", "head.norm")
            m.linear(r"head\.op_list\.3\.linear", "head.fc2")
            return _split_backbone_head(m.apply(sd, strict=True))
    head = ClsHead(num_classes=num_classes, norm_eps=eps, dtype=dtype, **kw)
    return SegModel(backbone, head), port


def create_sam_model(name: str, dtype=None) -> Tuple[EfficientViTSam, callable]:
    """Reference create_sam_model (sam_model_zoo.py:26-55); norm eps 1e-6
    is baked into SamConfig."""
    import jax.numpy as jnp

    if name not in SAM_CONFIGS:
        raise ValueError(f"unknown sam model {name!r}; zoo: {sorted(SAM_CONFIGS)}")
    cfg = SAM_CONFIGS[name]
    model = EfficientViTSam(cfg, dtype=dtype or jnp.float32)
    return model, lambda sd: port_sam_state_dict(sd, cfg)
