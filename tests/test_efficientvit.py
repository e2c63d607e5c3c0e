"""EfficientViT-SAM tests: LiteMLA torch parity (the signature kernel),
backbone stage geometry, prompt encoder semantics, mask decoder shapes, and
a full tiny-SAM forward under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from edgestyle_tpu.models.efficientvit.backbone import (
    L2,
    BackboneConfig,
    EfficientViTLargeBackbone,
)
from edgestyle_tpu.models.efficientvit.ops import relu_linear_attention
from edgestyle_tpu.models.efficientvit.sam import (
    SAM_L2,
    EfficientViTSam,
    MaskDecoder,
    PromptEncoder,
    SamConfig,
    boxes_to_points,
    postprocess_masks,
)
from tests.test_layers import to_nchw, to_nhwc


def torch_relu_linear_att(qkv_nchw, dim, eps=1e-15):
    """Reference math transcription (efficientvit/models/nn/ops.py:397-434)."""
    B, C, H, W = qkv_nchw.shape
    qkv = qkv_nchw.reshape(B, -1, 3 * dim, H * W).transpose(-1, -2)
    q, k, v = qkv[..., :dim], qkv[..., dim : 2 * dim], qkv[..., 2 * dim :]
    q = torch.relu(q)
    k = torch.relu(k)
    v = torch.nn.functional.pad(v, (0, 1), value=1.0)
    kv = torch.matmul(k.transpose(-1, -2), v)
    out = torch.matmul(q, kv)
    out = out[..., :-1] / (out[..., -1:] + eps)
    return out.transpose(-1, -2).reshape(B, -1, H, W)


def test_lite_mla_attention_matches_torch(rng):
    dim, heads = 8, 3
    x = rng.standard_normal((2, heads * 3 * dim, 6, 6)).astype(np.float32)
    ref = torch_relu_linear_att(torch.from_numpy(x), dim).numpy()
    ours = relu_linear_attention(jnp.asarray(to_nhwc(x)), dim)
    np.testing.assert_allclose(to_nchw(ours), ref, atol=1e-5)


TINY_BB = BackboneConfig(width_list=(8, 16, 32, 64, 96), depth_list=(1, 1, 1, 1, 1), qkv_dim=8)


def test_backbone_stage_geometry():
    bb = EfficientViTLargeBackbone(TINY_BB)
    x = jnp.zeros((1, 64, 64, 3))
    params = bb.init(jax.random.key(0), x)
    out = bb.apply(params, x)
    assert out["stage0"].shape == (1, 32, 32, 8)
    assert out["stage1"].shape == (1, 16, 16, 16)
    assert out["stage2"].shape == (1, 8, 8, 32)
    assert out["stage3"].shape == (1, 4, 4, 64)
    assert out["stage4"].shape == (1, 2, 2, 96)


def test_l2_backbone_geometry_eval_shape():
    bb = EfficientViTLargeBackbone(L2)
    x = jnp.zeros((1, 512, 512, 3))
    shapes = jax.eval_shape(bb.init, jax.random.key(0), x)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    out = jax.eval_shape(lambda p, x: bb.apply(p, x), shapes, x)
    assert out["stage2"].shape == (1, 64, 64, 128)
    assert out["stage3"].shape == (1, 32, 32, 256)
    assert out["stage4"].shape == (1, 16, 16, 512)
    # regression anchor for the l2 backbone parameter count
    assert 25_000_000 < n < 60_000_000, n


def test_prompt_encoder_padding_and_boxes():
    pe = PromptEncoder()
    pts = jnp.array([[[100.0, 200.0], [0.0, 0.0]]])
    lbl = jnp.array([[1, -1]])
    params = pe.init(jax.random.key(0), pts, lbl)
    sparse, dense = pe.apply(params, pts, lbl)
    assert sparse.shape == (1, 2, 256)
    assert dense.shape == (1, 64, 64, 256)
    # padding slot equals the not_a_point embedding exactly
    np.testing.assert_allclose(
        np.asarray(sparse[0, 1]), np.asarray(params["params"]["not_a_point_embed"]),
        atol=1e-6,
    )

    boxes = jnp.array([[10.0, 20.0, 110.0, 220.0]])
    bp, bl = boxes_to_points(boxes)
    assert bp.shape == (1, 2, 2) and bl.tolist() == [[2, 3]]


def test_mask_decoder_shapes(rng):
    dec = MaskDecoder()
    emb = jnp.asarray(rng.standard_normal((1, 64, 64, 256)), jnp.float32) * 0.1
    pe = jnp.asarray(rng.standard_normal((64, 64, 256)), jnp.float32) * 0.1
    sparse = jnp.asarray(rng.standard_normal((1, 2, 256)), jnp.float32) * 0.1
    dense = jnp.zeros((1, 64, 64, 256))
    params = dec.init(jax.random.key(0), emb, pe, sparse, dense)
    masks, iou = dec.apply(params, emb, pe, sparse, dense, True)
    assert masks.shape == (1, 3, 256, 256)
    assert iou.shape == (1, 3)
    m1, i1 = dec.apply(params, emb, pe, sparse, dense, False)
    assert m1.shape == (1, 1, 256, 256)

    out = postprocess_masks(masks, (512, 512))
    assert out.shape == (1, 3, 512, 512)


def test_tiny_sam_end_to_end_jit(rng):
    cfg = SamConfig(backbone=TINY_BB, neck_depth=1, image_size=64)
    sam = EfficientViTSam(cfg)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    pts = jnp.array([[[500.0, 500.0], [0.0, 0.0]]])
    lbl = jnp.array([[1, -1]])

    # tiny backbone stage4 is 2x2 — neck still upscales to 64 grid
    params = sam.init(jax.random.key(0), img, pts, lbl)
    masks, iou = jax.jit(sam.apply, static_argnames="multimask_output")(
        params, img, pts, lbl, multimask_output=True
    )
    assert masks.shape == (1, 3, 256, 256)
    assert np.isfinite(np.asarray(masks)).all()
    assert np.isfinite(np.asarray(iou)).all()


def test_automatic_mask_generation_tiny(rng):
    """Grid-prompt auto-mask path (reference automatic mask generator,
    efficientvit sam.py:460-514): one encode, chunked batched decodes,
    host-side filtering/NMS."""
    import jax

    from edgestyle_tpu.models.efficientvit.sam import (
        automatic_mask_candidates,
        build_point_grid,
        select_auto_masks,
        stability_score,
    )

    pts = build_point_grid(4, 1024)
    assert pts.shape == (16, 1, 2)
    assert float(pts.min()) > 0 and float(pts.max()) < 1024

    logits = jnp.asarray(rng.standard_normal((2, 3, 8, 8)), jnp.float32) * 5
    s = stability_score(logits)
    assert s.shape == (2, 3) and (np.asarray(s) <= 1.0).all()

    cfg = SamConfig(backbone=TINY_BB, neck_depth=1, image_size=64)
    sam = EfficientViTSam(cfg)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    params = sam.init(
        jax.random.key(0), img, jnp.zeros((1, 1, 2)), jnp.ones((1, 1), jnp.int32)
    )
    f = jax.jit(lambda v, im: automatic_mask_candidates(
        sam, v, im, points_per_side=2, chunk=4))
    masks, iou, stab = f(params, img)
    assert masks.shape == (12, 256, 256) and masks.dtype == jnp.bool_
    assert iou.shape == (12,) and stab.shape == (12,)
    assert np.isfinite(np.asarray(iou)).all()

    picked = select_auto_masks(masks, iou, stab,
                               pred_iou_thresh=-10.0, stability_thresh=0.0)
    assert len(picked) >= 1
    for r in picked:
        assert r["segmentation"].shape == (256, 256)
        assert set(r) == {"segmentation", "predicted_iou", "stability_score"}


def test_torch_bicubic_resize_matches_torch(rng):
    """ops/resize.py: torch-EXACT bicubic (a=-0.75, half-pixel, edge
    clamp) — the reference UpSampleLayer semantics. jax.image.resize's
    a=-0.5 kernel diverges ~7% of scale at the neck's 16→64 upsample
    (the r3 full-model SAM mirror caught this as a real parity gap)."""
    import torch
    import torch.nn.functional as F

    from edgestyle_tpu.ops.resize import torch_bicubic_resize

    for ih, iw, oh, ow in [(16, 16, 64, 64), (32, 32, 64, 64), (8, 12, 64, 64),
                           (64, 64, 32, 32)]:
        x = rng.standard_normal((2, ih, iw, 5)).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), size=(oh, ow),
            mode="bicubic", align_corners=False,
        ).numpy()
        got = np.transpose(
            np.asarray(torch_bicubic_resize(jnp.asarray(x), (oh, ow))),
            (0, 3, 1, 2),
        )
        np.testing.assert_allclose(got, want, atol=2e-6,
                                   err_msg=f"{ih}x{iw}->{oh}x{ow}")
    # identity passthrough
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    assert torch_bicubic_resize(x, (8, 8)) is x
