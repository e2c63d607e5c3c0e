"""Full-model torch↔JAX parity for the b-series backbone + Seg/Cls heads
(the remaining efficientvit model-zoo surface, SURVEY.md §2.4), through
the real `port_seg_state_dict` / `port_cls_state_dict` mappers at
upstream checkpoint key naming (reference seg.py:109-121, cls.py:55-66,
backbone.py:37-160).

This mirror pass caught two architecture gaps on first writing: SegHead
was missing the reference's `final_expand` 1x1 conv (cityscapes builders
use 4) and ClsHead's first linear must be bias-free with two distinct
widths (e.g. 1024→1280) — both fixed in heads.py alongside this test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgestyle_tpu.models.efficientvit.heads import (
    BBackboneConfig,
    ClsHead,
    EfficientViTBackbone,
    SegHead,
    port_cls_state_dict,
    port_seg_state_dict,
)
from tests import golden_mirror as gm

torch = pytest.importorskip("torch")

TINY_B = BBackboneConfig(width_list=(8, 16, 32, 32, 64),
                         depth_list=(1, 2, 1, 1, 2), dim=8)


def _load_synth(tmod, seed):
    shapes = {k: list(v.shape) for k, v in tmod.state_dict().items()}
    sd = gm.synth_state_dict(shapes, seed=seed)
    tmod.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    tmod.eval()
    return sd


def _run_pair(tmod, sd, port, jax_apply, x, atol):
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()
    bp, hp = port(sd)
    got = jax_apply(bp, hp, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.asarray(got)
    if got.ndim == 4:
        got = np.transpose(got, (0, 3, 1, 2))
    scale = max(1.0, float(np.abs(want).max()))
    err = float(np.abs(got - want).max()) / scale
    assert err < atol, f"scaled max diff {err:.2e}"
    return want


@pytest.mark.parametrize("middle_op,final_expand,act", [
    ("mbconv", 4, "hswish"),      # b-series cityscapes recipe
    ("fmbconv", None, "gelu"),    # l-series ade-style recipe
])
def test_seg_fullmodel_parity(middle_op, final_expand, act):
    from tests.torch_sam import BBackboneT, EfficientViTSegT, SegHeadT

    c = TINY_B
    tmod = EfficientViTSegT(
        BBackboneT(c.width_list, c.depth_list, dim=c.dim),
        SegHeadT((c.width_list[4], c.width_list[3], c.width_list[2]),
                 head_width=16, head_depth=2, n_classes=5,
                 final_expand=final_expand, act=act, middle_op=middle_op),
    )
    sd = _load_synth(tmod, seed=31 + (final_expand is None))
    bb = EfficientViTBackbone(c)
    head = SegHead(head_width=16, head_depth=2, num_classes=5,
                   middle_op=middle_op, final_expand=final_expand, act=act)

    def apply(bp, hp, x):
        feats = bb.apply({"params": bp}, x)
        return head.apply({"params": hp}, feats)

    x = np.random.default_rng(5).standard_normal((2, 3, 64, 64)).astype(np.float32)
    want = _run_pair(
        tmod, sd,
        lambda s: port_seg_state_dict(s, c, head_depth=2,
                                      final_expand=final_expand,
                                      middle_op=middle_op),
        jax.jit(apply), x, 2e-4,
    )
    assert want.shape == (2, 5, 8, 8)  # stage2 resolution


def test_cls_fullmodel_parity():
    from tests.torch_sam import BBackboneT, ClsHeadT, EfficientViTClsT

    c = TINY_B
    tmod = EfficientViTClsT(
        BBackboneT(c.width_list, c.depth_list, dim=c.dim),
        ClsHeadT(c.width_list[4], (48, 56), n_classes=11),
    )
    sd = _load_synth(tmod, seed=77)
    bb = EfficientViTBackbone(c)
    head = ClsHead(widths=(48, 56), num_classes=11)

    def apply(bp, hp, x):
        return head.apply({"params": hp}, bb.apply({"params": bp}, x))

    x = np.random.default_rng(6).standard_normal((2, 3, 64, 64)).astype(np.float32)
    want = _run_pair(tmod, sd, lambda s: port_cls_state_dict(s, c),
                     jax.jit(apply), x, 2e-4)
    assert want.shape == (2, 11)
