"""EfficientViT-SAM port-mapper bijection test: build the upstream torch
key list from our param tree by inverse renaming, run the mapper, assert
exact coverage + shape consistency (same approach as test_unet_porting)."""

import re

import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.efficientvit.sam import (
    SAM_L2,
    EfficientViTSam,
    boxes_to_points,
    port_sam_state_dict,
)

FID_TO_IDX = {"stage4": 0, "stage3": 1, "stage2": 2}


def _torch_name(p: str) -> str:
    # backbone
    m = re.match(r"image_encoder\.backbone\.(.*)", p)
    if m:
        rest = m.group(1)
        rest = re.sub(r"stage0_stem", "stages.0.op_list.0", rest)
        rest = re.sub(r"stage0_block_(\d+)\.(conv\d)",
                      lambda g: f"stages.0.op_list.{int(g.group(1))+1}.main.{g.group(2)}", rest)
        rest = re.sub(r"stage([123])_block_(\d+)\.", r"stages.\1.op_list.\2.main.", rest)
        rest = re.sub(r"stage4_block_0\.", "stages.4.op_list.0.main.", rest)
        rest = re.sub(
            r"stage4_vit_(\d+)\.context_module\.qkv",
            lambda g: f"stages.4.op_list.{int(g.group(1))+1}.context_module.main.qkv", rest)
        rest = re.sub(
            r"stage4_vit_(\d+)\.context_module\.aggreg_0_depth",
            lambda g: f"stages.4.op_list.{int(g.group(1))+1}.context_module.main.aggreg.0.0", rest)
        rest = re.sub(
            r"stage4_vit_(\d+)\.context_module\.aggreg_0_point",
            lambda g: f"stages.4.op_list.{int(g.group(1))+1}.context_module.main.aggreg.0.1", rest)
        rest = re.sub(
            r"stage4_vit_(\d+)\.context_module\.proj",
            lambda g: f"stages.4.op_list.{int(g.group(1))+1}.context_module.main.proj", rest)
        rest = re.sub(
            r"stage4_vit_(\d+)\.local_module",
            lambda g: f"stages.4.op_list.{int(g.group(1))+1}.local_module.main", rest)
        p = "image_encoder.backbone." + rest
        p = p.replace("image_encoder.backbone.stages", "image_encoder.backbone.stages")
    p = re.sub(r"image_encoder\.neck\.input_(stage\d)",
               lambda g: f"image_encoder.neck.input_ops.{FID_TO_IDX[g.group(1)]}.op_list.0", p)
    p = re.sub(r"image_encoder\.neck\.middle_(\d+)",
               r"image_encoder.neck.middle.op_list.\1.main", p)
    p = p.replace("image_encoder.neck.output_sam_encoder",
                  "image_encoder.neck.output_ops.0.op_list.0")
    # decoder
    p = re.sub(r"mask_decoder\.transformer\.layers_(\d)", r"mask_decoder.transformer.layers.\1", p)
    p = p.replace(".mlp_lin1", ".mlp.lin1").replace(".mlp_lin2", ".mlp.lin2")
    p = p.replace("mask_decoder.upscale_conv1", "mask_decoder.output_upscaling.0")
    p = p.replace("mask_decoder.upscale_norm", "mask_decoder.output_upscaling.1")
    p = p.replace("mask_decoder.upscale_conv2", "mask_decoder.output_upscaling.3")
    p = re.sub(r"mask_decoder\.hyper_mlps_(\d)\.layers_(\d)",
               r"mask_decoder.output_hypernetworks_mlps.\1.layers.\2", p)
    p = re.sub(r"mask_decoder\.iou_mlp\.layers_(\d)",
               r"mask_decoder.iou_prediction_head.layers.\1", p)
    # leaves
    if p.endswith(".kernel"):
        p = p[: -len("kernel")] + "weight"
    elif p.endswith(".scale"):
        p = p[: -len("scale")] + "weight"
    elif p.endswith(".mean"):
        p = p[: -len("mean")] + "running_mean"
    elif p.endswith(".var"):
        p = p[: -len("var")] + "running_var"
    return p


def _torch_shape(flax_path: str, shape, is_convT: bool):
    leaf = flax_path.split(".")[-1]
    if leaf == "kernel":
        if len(shape) == 4:
            if is_convT:  # flax (kh,kw,in,out) → torch (in,out,kh,kw)
                return (shape[2], shape[3], shape[0], shape[1])
            return (shape[3], shape[2], shape[0], shape[1])
        return (shape[1], shape[0])
    return tuple(shape)


def synthetic_torch_sd(cfg=SAM_L2, dtype=np.float32):
    """Zero-filled upstream-torch-layout EfficientViTSam state dict for
    ``cfg`` (shapes via eval_shape; shared by the bijection test and the
    app checkpoint-loader test)."""
    sam = EfficientViTSam(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    pts, lbl = boxes_to_points(jnp.zeros((1, 4)))
    tree = jax.eval_shape(sam.init, jax.random.key(0), img, pts, lbl)["params"]
    flat = porting.flatten(tree)

    sd = {}
    for path, leaf in flat.items():
        if path == "prompt_encoder.point_embeddings":
            for i in range(4):
                sd[f"prompt_encoder.point_embeddings.{i}.weight"] = np.zeros((1, 256), dtype)
            continue
        if path == "prompt_encoder.not_a_point_embed":
            sd["prompt_encoder.not_a_point_embed.weight"] = np.zeros((1, 256), dtype)
            continue
        if path == "prompt_encoder.no_mask_embed":
            sd["prompt_encoder.no_mask_embed.weight"] = np.zeros((1, 256), dtype)
            continue
        if path == "prompt_encoder.pe_gaussian":
            sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = np.zeros(
                (2, 128), dtype)
            continue
        if path in ("mask_decoder.iou_token", "mask_decoder.mask_tokens"):
            sd[path + ".weight"] = np.zeros(tuple(leaf.shape), dtype)
            continue
        is_convT = "upscale_conv" in path
        sd[_torch_name(path)] = np.zeros(_torch_shape(path, leaf.shape, is_convT), dtype)
    return sd, flat


def test_sam_port_bijection():
    sd, flat = synthetic_torch_sd(SAM_L2)
    mapped = port_sam_state_dict(sd, SAM_L2)
    assert set(mapped) == set(flat), (
        sorted(set(flat) - set(mapped))[:6], sorted(set(mapped) - set(flat))[:6])
    for k in flat:
        assert mapped[k].shape == tuple(flat[k].shape), (k, mapped[k].shape, flat[k].shape)


def test_conv_transpose_port_matches_torch(rng):
    """Pin flax ConvTranspose semantics vs torch ConvTranspose2d for the
    decoder's 2x2-stride-2 upscaling."""
    import torch

    x = rng.standard_normal((1, 8, 4, 4)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(8, 5, 2, stride=2)
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x)).numpy()

    import flax.linen as nn

    kern = porting.conv_transpose_kernel(tconv.weight.detach().numpy())
    mod = nn.ConvTranspose(5, (2, 2), strides=(2, 2))
    params = {"kernel": jnp.asarray(kern), "bias": jnp.asarray(tconv.bias.detach().numpy())}
    out = mod.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(np.asarray(out), (0, 3, 1, 2)), ref, atol=1e-5)
