"""b-series backbone + cls/seg heads: geometry and jit."""

import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.models.efficientvit.heads import (
    B0,
    BBackboneConfig,
    ClsHead,
    EfficientViTBackbone,
    SegHead,
)

TINY_B = BBackboneConfig(width_list=(8, 16, 16, 32, 32), depth_list=(1, 1, 1, 1, 1), dim=8)


def test_b_backbone_geometry():
    bb = EfficientViTBackbone(TINY_B)
    x = jnp.zeros((1, 64, 64, 3))
    params = bb.init(jax.random.key(0), x)
    out = jax.jit(lambda p, x: bb.apply(p, x))(params, x)
    assert out["stage0"].shape == (1, 32, 32, 8)
    assert out["stage2"].shape == (1, 8, 8, 16)
    assert out["stage4"].shape == (1, 2, 2, 32)


def test_cls_head():
    bb = EfficientViTBackbone(TINY_B)
    head = ClsHead(widths=(32, 40), num_classes=10)
    x = jnp.zeros((2, 64, 64, 3))
    bp = bb.init(jax.random.key(0), x)
    feats = bb.apply(bp, x)
    hp = head.init(jax.random.key(1), feats)
    logits = head.apply(hp, feats)
    assert logits.shape == (2, 10)


def test_seg_head():
    bb = EfficientViTBackbone(TINY_B)
    head = SegHead(head_width=16, head_depth=1, num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    bp = bb.init(jax.random.key(0), x)
    feats = bb.apply(bp, x)
    hp = head.init(jax.random.key(1), feats)
    seg = head.apply(hp, feats)
    assert seg.shape == (1, 8, 8, 5)  # stage2 resolution
    assert np.isfinite(np.asarray(seg)).all()
