"""EfficientViT model-zoo registry (zoo.py) vs the reference zoo surface
(seg_model_zoo.py / cls_model_zoo.py / sam_model_zoo.py): every name
builds, geometry is right (eval_shape — no FLOPs), port mappers are
bijective against mirror-derived torch state dicts, and a tiny
large-backbone seg model is numerically torch-parity through the zoo's
port path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.efficientvit import zoo
from tests import golden_mirror as gm

ALL_SEG = [(d, n) for d, r in zoo.SEG_RECIPES.items() for n in r]


@pytest.mark.parametrize("dataset,name", ALL_SEG)
def test_seg_zoo_geometry(dataset, name):
    model, _ = zoo.create_seg_model(name, dataset)
    out = jax.eval_shape(model.init, jax.random.key(0),
                         jnp.zeros((1, 128, 128, 3)))
    n_cls = zoo.SEG_RECIPES[dataset][name]["num_classes"]
    shp = jax.eval_shape(
        lambda p, x: model.apply(p, x), out, jnp.zeros((1, 128, 128, 3))
    )
    assert shp.shape == (1, 16, 16, n_cls)  # stride-8 head


@pytest.mark.parametrize("name", sorted(zoo.CLS_RECIPES))
def test_cls_zoo_geometry(name):
    model, _ = zoo.create_cls_model(name, num_classes=1000)
    p = jax.eval_shape(model.init, jax.random.key(0), jnp.zeros((1, 224, 224, 3)))
    shp = jax.eval_shape(lambda p, x: model.apply(p, x), p,
                         jnp.zeros((2, 224, 224, 3)))
    assert shp.shape == (2, 1000)


def test_sam_zoo_names():
    for name in ("l0", "l1", "l2"):
        model, port = zoo.create_sam_model(name)
        assert model.cfg.norm_eps == 1e-6
        assert callable(port)
    with pytest.raises(ValueError):
        zoo.create_sam_model("xl9")


@pytest.mark.parametrize("dataset,name", [("cityscapes", "b1"),
                                          ("ade20k", "l1")])
def test_seg_zoo_port_bijection(dataset, name):
    """Mirror-derived torch state dict at the real recipe → port → exact
    key/shape match with the flax tree (incl. the fmbconv+final_expand=8
    l1-ade head and the large-backbone prefix)."""
    torch = pytest.importorskip("torch")
    from tests.torch_sam import BackboneT, BBackboneT, EfficientViTSegT, SegHeadT

    kw = zoo.SEG_RECIPES[dataset][name]
    if name.startswith("b"):
        c = zoo._B_BACKBONES[name]
        tb = BBackboneT(c.width_list, c.depth_list, dim=c.dim)
    else:
        c = zoo._L_BACKBONES[name]
        tb = BackboneT(c.width_list, c.depth_list)
    in_chs = (c.width_list[4], c.width_list[3], c.width_list[2])
    tmod = EfficientViTSegT(
        tb,
        SegHeadT(in_chs, kw["head_width"], kw["head_depth"],
                 kw["num_classes"], expand=kw["expand_ratio"],
                 final_expand=kw["final_expand"],
                 act=kw.get("act", "hswish"), middle_op=kw["middle_op"]),
    )
    sd = {k: np.zeros(tuple(v.shape), np.float32)
          for k, v in tmod.state_dict().items()}

    model, port = zoo.create_seg_model(name, dataset)
    bp, hp = port(sd)
    flat_got = porting.flatten({"backbone": bp, "head": hp})
    tree = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
    flat_want = porting.flatten(tree)
    assert set(flat_got) == set(flat_want), (
        sorted(set(flat_want) - set(flat_got))[:5],
        sorted(set(flat_got) - set(flat_want))[:5])
    for k in flat_want:
        assert flat_got[k].shape == tuple(flat_want[k].shape), k


def test_cls_zoo_port_bijection_l2():
    torch = pytest.importorskip("torch")
    from tests.torch_sam import BackboneT, ClsHeadT, EfficientViTClsT

    c = zoo._L_BACKBONES["l2"]
    tmod = EfficientViTClsT(
        BackboneT(c.width_list, c.depth_list),
        ClsHeadT(c.width_list[4], (3072, 3200), n_classes=1000, act="gelu"),
    )
    sd = {k: np.zeros(tuple(v.shape), np.float32)
          for k, v in tmod.state_dict().items()}
    model, port = zoo.create_cls_model("l2")
    bp, hp = port(sd)
    flat_got = porting.flatten({"backbone": bp, "head": hp})
    tree = jax.eval_shape(model.init, jax.random.key(0),
                          jnp.zeros((1, 64, 64, 3)))["params"]
    flat_want = porting.flatten(tree)
    assert set(flat_got) == set(flat_want)


def test_large_seg_numeric_parity_tiny():
    """Numeric torch↔JAX parity for a LARGE-backbone seg model through the
    zoo's port path (tiny widths; l1-city-style: fmbconv, expand 1,
    final_expand None, gelu)."""
    torch = pytest.importorskip("torch")
    from edgestyle_tpu.models.efficientvit.backbone import BackboneConfig
    from edgestyle_tpu.models.efficientvit.backbone import (
        EfficientViTLargeBackbone,
    )
    from edgestyle_tpu.models.efficientvit.heads import SegHead
    from tests.torch_sam import (
        BackboneT,
        EfficientViTSegT,
        SegHeadT,
        set_norm_eps_t,
    )

    cfg = BackboneConfig(width_list=(8, 16, 32, 64, 128),
                         depth_list=(1, 1, 1, 2, 2))
    tmod = EfficientViTSegT(
        BackboneT(cfg.width_list, cfg.depth_list),
        SegHeadT((128, 64, 32), head_width=32, head_depth=2, n_classes=7,
                 expand=1, final_expand=None, act="gelu",
                 middle_op="fmbconv"),
    )
    set_norm_eps_t(tmod, 1e-7)  # reference l-series runtime
    shapes = {k: list(v.shape) for k, v in tmod.state_dict().items()}
    sd = gm.synth_state_dict(shapes, seed=404)
    tmod.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    tmod.eval()

    port = zoo._port_large_seg(cfg, head_depth=2, final_expand=None,
                               middle_op="fmbconv")
    bp, hp = port(sd)
    model = zoo.SegModel(
        EfficientViTLargeBackbone(cfg, norm_eps=1e-7),
        SegHead(head_width=32, head_depth=2, num_classes=7, expand_ratio=1,
                middle_op="fmbconv", final_expand=None, act="gelu",
                norm_eps=1e-7),
    )
    x = np.random.default_rng(8).standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()
    got = jax.jit(lambda p, x: model.apply(p, x))(
        {"params": {"backbone": bp, "head": hp}},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    scale = max(1.0, float(np.abs(want).max()))
    assert float(np.abs(got - want).max()) / scale < 2e-4
    assert want.shape == (1, 7, 8, 8)
