"""EfficientViT-SAM: neck + image encoder + SAM prompt encoder/mask decoder.

Rebuild of /root/reference/efficientvit/models/efficientvit/sam.py (SamNeck
:109-171, image encoder :174-190, builders :517-595) plus the SAM
PromptEncoder / MaskDecoder / TwoWayTransformer the reference imports from
segment_anything. EdgeStyle runs five of these per frame (base l2 + four
finetuned mask-decoder heads — subject/agnostic/clothes/head;
extract_dataset.py:60-90), so the decoder is deliberately cheap to re-run
with swapped head params.

TPU-first notes: all prompts are fixed-size (EdgeStyle only ever uses one
box or a handful of keypoint-derived points — extract_dataset.py:371-377,
segmenter trainers use a single GT-derived box), so the prompt encoder
takes a fixed (B, P, 2) point tensor + label mask and the whole
photo→masks program is shape-static and jittable.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from edgestyle_tpu.models.efficientvit.backbone import (
    L0, L1, L2, BackboneConfig, EfficientViTLargeBackbone,
)
from edgestyle_tpu.models.efficientvit.ops import (
    ConvLayer,
    FusedMBConv,
    LayerNorm2d,
    MBConv,
)


# --------------------------------------------------------------------- neck
class SamNeck(nn.Module):
    """DAG: {stage4, stage3, stage2} → 1x1 conv(→256)+bn → bicubic resize to
    64×64 → add → N middle FusedMBConv residual blocks → 1x1 out conv."""

    head_depth: int = 12  # l2 (reference sam.py:580)
    head_width: int = 256
    out_dim: int = 256
    middle_op: str = "fmbconv"
    in_channels: Tuple[int, ...] = (512, 256, 128)
    fids: Tuple[str, ...] = ("stage4", "stage3", "stage2")
    feature_hw: int = 64
    norm_eps: float = 1e-6  # reference create_sam_model set_norm_eps(1e-6)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jax.Array]) -> jax.Array:
        merged = None
        for i, fid in enumerate(self.fids):
            y = ConvLayer(
                self.head_width, 1, norm="bn", act=None,
                norm_eps=self.norm_eps, dtype=self.dtype,
                name=f"input_{fid}",
            )(feats[fid])
            # torch-exact bicubic (a=-0.75): jax.image.resize's a=-0.5
            # kernel diverged ~7% of scale from the reference UpSampleLayer
            # (ops/resize.py; caught by the r3 full-model SAM mirror)
            from edgestyle_tpu.ops.resize import torch_bicubic_resize

            y = torch_bicubic_resize(y, (self.feature_hw, self.feature_hw))
            merged = y if merged is None else merged + y
        x = merged
        for j in range(self.head_depth):
            if self.middle_op == "fmbconv":
                blk = FusedMBConv(
                    self.head_width, expand_ratio=1, norm=("bn", "bn"),
                    act=("gelu", None), norm_eps=self.norm_eps,
                    dtype=self.dtype, name=f"middle_{j}",
                )
            else:
                blk = MBConv(
                    self.head_width, expand_ratio=4, norm=("bn",) * 3,
                    act=("gelu", "gelu", None), norm_eps=self.norm_eps,
                    dtype=self.dtype, name=f"middle_{j}",
                )
            x = x + blk(x)
        x = ConvLayer(
            self.out_dim, 1, use_bias=True, norm=None, act=None,
            dtype=self.dtype, name="output_sam_encoder",
        )(x)
        return x


class SamImageEncoder(nn.Module):
    backbone_cfg: BackboneConfig = L2
    neck_depth: int = 12
    norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = EfficientViTLargeBackbone(
            self.backbone_cfg, self.norm_eps, self.dtype, name="backbone")(x)
        y = SamNeck(head_depth=self.neck_depth, norm_eps=self.norm_eps,
                    dtype=self.dtype, name="neck")(feats)
        return LayerNorm2d(eps=self.norm_eps, name="norm")(y)


# ------------------------------------------------------------- prompt encoder
class PromptEncoder(nn.Module):
    """SAM PromptEncoder (embed_dim 256, 64×64 grid, input size 1024).

    Points: (B, P, 2) in input-image pixel coords with labels (B, P):
      1 = positive, 0 = negative, -1 = padding, 2/3 = box corners.
    Boxes are encoded by the caller as two corner points with labels 2, 3.
    """

    embed_dim: int = 256
    input_size: int = 1024
    grid_hw: int = 64

    def setup(self):
        self.pe_gaussian = self.param(
            "pe_gaussian",
            lambda k, s: jax.random.normal(k, s, jnp.float32),
            (2, self.embed_dim // 2),
        )
        # 0: neg point, 1: pos point, 2: box tl, 3: box br
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(1.0), (4, self.embed_dim)
        )
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )

    def _pe(self, coords01: jax.Array) -> jax.Array:
        """Random-Fourier positional encoding of [0,1] coords (..., 2)."""
        c = 2.0 * coords01 - 1.0
        proj = (2.0 * jnp.pi) * (c @ self.pe_gaussian)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)

    def dense_pe(self) -> jax.Array:
        """(grid, grid, embed_dim) positional encoding of the image grid."""
        g = self.grid_hw
        ys = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        xs = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        grid = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1)  # (g,g,2) x,y
        return self._pe(grid)

    def __call__(self, points: jax.Array, labels: jax.Array):
        """→ sparse (B, P, 256) embeddings, dense (B, 64, 64, 256)."""
        coords = (points + 0.5) / self.input_size
        pe = self._pe(coords)
        lbl = labels[..., None]
        emb = jnp.where(lbl == -1, self.not_a_point_embed[None, None], pe)
        for i in range(4):
            emb = emb + jnp.where(lbl == i, self.point_embeddings[i], 0.0)
        b = points.shape[0]
        dense = jnp.broadcast_to(
            self.no_mask_embed[None, None, None, :],
            (b, self.grid_hw, self.grid_hw, self.embed_dim),
        )
        return emb, dense


def boxes_to_points(boxes: jax.Array):
    """(B, 4) xyxy → points (B, 2, 2), labels (B, 2) with SAM's +0.5 corner
    shift applied by the caller-side transform in the reference."""
    tl = boxes[:, :2]
    br = boxes[:, 2:]
    pts = jnp.stack([tl, br], axis=1)
    lbl = jnp.broadcast_to(jnp.array([2, 3]), (boxes.shape[0], 2))
    return pts, lbl


# ------------------------------------------------------------- mask decoder
class MLP(nn.Module):
    hidden: int
    out: int
    depth: int
    sigmoid_out: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth - 1):
            x = jax.nn.relu(nn.Dense(self.hidden, name=f"layers_{i}")(x))
        x = nn.Dense(self.out, name=f"layers_{self.depth - 1}")(x)
        if self.sigmoid_out:
            x = jax.nn.sigmoid(x)
        return x


class Attention(nn.Module):
    """SAM decoder attention with optional internal downsample."""

    embed_dim: int = 256
    num_heads: int = 8
    downsample_rate: int = 1

    @nn.compact
    def __call__(self, q, k, v):
        d = self.embed_dim // self.downsample_rate
        hq = nn.Dense(d, name="q_proj")(q)
        hk = nn.Dense(d, name="k_proj")(k)
        hv = nn.Dense(d, name="v_proj")(v)
        b, nq, _ = hq.shape
        nk = hk.shape[1]
        hd = d // self.num_heads
        qh = hq.reshape(b, nq, self.num_heads, hd).transpose(0, 2, 1, 3)
        kh = hk.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)
        vh = hv.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(hd).astype(qh.dtype)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        o = o.transpose(0, 2, 1, 3).reshape(b, nq, d)
        return nn.Dense(self.embed_dim, name="out_proj")(o)


class TwoWayAttentionBlock(nn.Module):
    skip_first_layer_pe: bool = False
    mlp_dim: int = 2048
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        from edgestyle_tpu.models.layers import LayerNorm

        if self.skip_first_layer_pe:
            queries = Attention(name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + Attention(name="self_attn")(q, q, queries)
        queries = LayerNorm(eps=self.norm_eps, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + Attention(downsample_rate=2, name="cross_attn_token_to_image")(q, k, keys)
        queries = LayerNorm(eps=self.norm_eps, name="norm2")(queries)

        h = nn.Dense(self.mlp_dim, name="mlp_lin1")(queries)
        h = nn.Dense(256, name="mlp_lin2")(jax.nn.relu(h))
        queries = LayerNorm(eps=self.norm_eps, name="norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + Attention(downsample_rate=2, name="cross_attn_image_to_token")(k, q, queries)
        keys = LayerNorm(eps=self.norm_eps, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    depth: int = 2
    mlp_dim: int = 2048
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding):
        from edgestyle_tpu.models.layers import LayerNorm

        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(1, h * w, c), keys.shape)
        queries = point_embedding
        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                skip_first_layer_pe=(i == 0), mlp_dim=self.mlp_dim,
                norm_eps=self.norm_eps, name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = queries + Attention(downsample_rate=2, name="final_attn_token_to_image")(q, k, keys)
        queries = LayerNorm(eps=self.norm_eps, name="norm_final_attn")(queries)
        return queries, keys


class MaskDecoder(nn.Module):
    num_multimask_outputs: int = 3
    transformer_dim: int = 256
    iou_head_depth: int = 3
    norm_eps: float = 1e-6

    @nn.compact
    def __call__(self, image_embeddings, image_pe, sparse_prompt, dense_prompt,
                 multimask_output: bool = True):
        """image_embeddings: (B,64,64,256); sparse: (B,P,256);
        dense: (B,64,64,256). Returns (masks (B,M,256,256), iou (B,M))."""
        n_mask_tokens = self.num_multimask_outputs + 1
        iou_token = self.param("iou_token", nn.initializers.normal(1.0), (1, 256))
        mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (n_mask_tokens, 256)
        )
        b = sparse_prompt.shape[0]
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None], (b,) + out_tokens.shape), sparse_prompt],
            axis=1,
        )
        src = image_embeddings + dense_prompt

        hs, src_out = TwoWayTransformer(norm_eps=self.norm_eps, name="transformer")(src, image_pe, tokens)
        iou_tok_out = hs[:, 0]
        mask_toks_out = hs[:, 1 : 1 + n_mask_tokens]

        hgrid = src_out.reshape(b, 64, 64, 256)
        up = nn.ConvTranspose(64, (2, 2), strides=(2, 2), name="upscale_conv1")(hgrid)
        up = LayerNorm2d(eps=self.norm_eps, name="upscale_norm")(up).astype(up.dtype)
        up = jax.nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(32, (2, 2), strides=(2, 2), name="upscale_conv2")(up)
        up = jax.nn.gelu(up, approximate=False)  # (B,256,256,32)

        hyper = jnp.stack(
            [
                MLP(256, 32, 3, name=f"hyper_mlps_{i}")(mask_toks_out[:, i])
                for i in range(n_mask_tokens)
            ],
            axis=1,
        )  # (B, M, 32)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, up)
        iou_pred = MLP(256, n_mask_tokens, self.iou_head_depth, name="iou_mlp")(iou_tok_out)

        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, :1], iou_pred[:, :1]


# ---------------------------------------------------------------- assembly
@dataclasses.dataclass(frozen=True)
class SamConfig:
    backbone: BackboneConfig = L2
    neck_depth: int = 12
    image_size: int = 512  # EfficientViT-SAM runs at 512 (reference sam.py:214)
    prompt_input_size: int = 1024
    # the reference zoo runs every SAM norm at eps 1e-6
    # (sam_model_zoo.py:44 set_norm_eps)
    norm_eps: float = 1e-6


SAM_L0 = SamConfig(backbone=L0, neck_depth=4)
SAM_L1 = SamConfig(backbone=L1, neck_depth=8)
SAM_L2 = SamConfig(backbone=L2, neck_depth=12)

SAM_PIXEL_MEAN = (123.675, 116.28, 103.53)
SAM_PIXEL_STD = (58.395, 57.12, 57.375)


class EfficientViTSam(nn.Module):
    """Full SAM: encode once, decode cheaply per prompt/head.

    __call__(image, points, labels) → (masks (B,M,256,256) logits, iou).
    `image`: (B, 512, 512, 3), already resized/padded, normalized with the
    SAM mean/std. Point coords live in the 1024-scale prompt frame
    (matching the reference's predictor transform)."""

    cfg: SamConfig = SAM_L2
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.image_encoder = SamImageEncoder(
            self.cfg.backbone, self.cfg.neck_depth, self.cfg.norm_eps, self.dtype
        )
        self.prompt_encoder = PromptEncoder(input_size=self.cfg.prompt_input_size)
        self.mask_decoder = MaskDecoder(norm_eps=self.cfg.norm_eps)

    def encode_image(self, image):
        return self.image_encoder(image)

    def decode(self, embedding, points, labels, multimask_output: bool = True):
        sparse, dense = self.prompt_encoder(points, labels)
        image_pe = self.prompt_encoder.dense_pe()
        return self.mask_decoder(
            embedding, image_pe, sparse, dense, multimask_output
        )

    def __call__(self, image, points, labels, multimask_output: bool = True):
        emb = self.encode_image(image)
        return self.decode(emb, points, labels, multimask_output)


def preprocess_sam_image(img01: jax.Array) -> jax.Array:
    """(B,H,W,3) in [0,1] (already 512-resized/corner-padded) → normalized."""
    mean = jnp.asarray(SAM_PIXEL_MEAN) / 255.0
    std = jnp.asarray(SAM_PIXEL_STD) / 255.0
    return (img01 - mean) / std


def postprocess_masks(masks: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """(B,M,256,256) logits → bilinear to (B,M,*out_hw) (reference
    postprocess chain sam.py:219-239 with square 512 inputs)."""
    b, m, h, w = masks.shape
    return jax.image.resize(masks, (b, m) + tuple(out_hw), method="bilinear")


# --------------------------------------------------------------------------
# Automatic mask generation (reference EfficientViTSamAutomaticMaskGenerator,
# /root/reference/efficientvit/models/efficientvit/sam.py:460-514: uniform
# point grid → batched multimask decode → IoU/stability filtering → NMS).
# TPU-first split: the heavy part (one image encode + all grid-point decodes,
# chunked through lax.map so activations stay bounded) is ONE jittable
# program with static shapes; the cheap data-dependent tail (threshold
# filtering + greedy NMS over ≤ a few hundred candidates) runs host-side in
# numpy, as it does in the reference.
# --------------------------------------------------------------------------

def build_point_grid(points_per_side: int, prompt_input_size: int = 1024) -> jax.Array:
    """Uniform cell-centered grid over the image in the prompt frame:
    (points_per_side², 1, 2) xy coords (reference build_point_grid
    semantics: offset half a cell from the borders)."""
    step = 1.0 / points_per_side
    xs = (jnp.arange(points_per_side, dtype=jnp.float32) + 0.5) * step
    gx, gy = jnp.meshgrid(xs, xs, indexing="xy")
    pts = jnp.stack([gx.ravel(), gy.ravel()], axis=-1) * prompt_input_size
    return pts[:, None, :]


def stability_score(mask_logits: jax.Array, mask_threshold: float = 0.0,
                    offset: float = 1.0) -> jax.Array:
    """SAM stability score: IoU between the binarizations at
    threshold±offset (ratio of the tight to the loose mask area)."""
    f = mask_logits.astype(jnp.float32)
    inter = jnp.sum(f > (mask_threshold + offset), axis=(-2, -1))
    union = jnp.sum(f > (mask_threshold - offset), axis=(-2, -1))
    return inter / jnp.maximum(union, 1)


def automatic_mask_candidates(
    sam: "EfficientViTSam",
    variables,
    image: jax.Array,
    points_per_side: int = 16,
    chunk: int = 64,
):
    """One image (1,H,W,3, preprocessed) → all grid-point mask candidates.

    Returns (masks_bool (N*3, 256, 256), iou (N*3,), stability (N*3,)) with
    N = points_per_side². Jit-safe: fixed grid, fixed chunking, boolean
    masks (not logits) so the host transfer is 8× smaller. Feed the result
    to `select_auto_masks` for the reference's filtering/NMS tail."""
    emb = sam.apply(variables, image, method=sam.encode_image)
    pts = build_point_grid(points_per_side, sam.cfg.prompt_input_size)
    n = pts.shape[0]
    chunk = min(chunk, n)
    if n % chunk:
        raise ValueError(f"points_per_side²={n} not divisible by chunk={chunk}")

    def decode_chunk(p):  # p: (chunk, 1, 2)
        e = jnp.broadcast_to(emb, (chunk,) + emb.shape[1:])
        lbl = jnp.ones((chunk, 1), jnp.int32)
        masks, iou = sam.apply(variables, e, p, lbl, True, method=sam.decode)
        return masks > 0.0, iou, stability_score(masks)

    masks, iou, stab = jax.lax.map(decode_chunk, pts.reshape(-1, chunk, 1, 2))
    m = masks.shape[-3]
    return (
        masks.reshape(n * m, masks.shape[-2], masks.shape[-1]),
        iou.reshape(n * m),
        stab.reshape(n * m),
    )


def select_auto_masks(
    masks,
    iou,
    stability,
    pred_iou_thresh: float = 0.88,
    stability_thresh: float = 0.95,
    nms_iou: float = 0.7,
    min_area: int = 0,
):
    """Host-side tail of automatic mask generation: threshold on predicted
    IoU + stability, then greedy mask-IoU NMS in descending predicted-IoU
    order. Returns a list of {segmentation, predicted_iou, stability_score}
    dicts (reference generator output schema)."""
    import numpy as np

    masks = np.asarray(masks)
    iou = np.asarray(iou, np.float32)
    stability = np.asarray(stability, np.float32)
    areas = masks.reshape(masks.shape[0], -1).sum(-1)
    keep = (iou >= pred_iou_thresh) & (stability >= stability_thresh) & (areas > min_area)
    order = np.argsort(-iou)
    order = order[keep[order]]
    out = []
    for idx in order:
        m = masks[idx]
        dup = False
        for prev in out:
            p = prev["segmentation"]
            inter = np.logical_and(m, p).sum()
            union = np.logical_or(m, p).sum()
            if union and inter / union > nms_iou:
                dup = True
                break
        if not dup:
            out.append({
                "segmentation": m,
                "predicted_iou": float(iou[idx]),
                "stability_score": float(stability[idx]),
            })
    return out


# --------------------------------------------------------------------------
# Weight porting: upstream EfficientViT-SAM checkpoints (han-cai l0/l1/l2 +
# the four finetuned EdgeStyle decoders) → our param trees. Torch naming
# follows the reference module structure (OpSequential `op_list`,
# ResidualBlock `main`, DAGBlock `input_ops`/`middle`/`output_ops`).
# --------------------------------------------------------------------------

def _bn(m, tp, fp):
    m.rule(tp + r"\.weight", fp + ".scale")
    m.rule(tp + r"\.bias", fp + ".bias")
    m.rule(tp + r"\.running_mean", fp + ".mean")
    m.rule(tp + r"\.running_var", fp + ".var")
    m.rule(tp + r"\.num_batches_tracked", "_drop")


def _conv_layer(m, tp, fp, norm=True):
    m.conv(tp + r"\.conv", fp + ".conv")
    if norm:
        _bn(m, tp + r"\.norm", fp + ".norm")


def _fmb(m, tp, fp, norms=(True, True)):
    _conv_layer(m, tp + r"\.spatial_conv", fp + ".spatial_conv", norms[0])
    _conv_layer(m, tp + r"\.point_conv", fp + ".point_conv", norms[1])


def _mb(m, tp, fp, norms=(True, True, True)):
    _conv_layer(m, tp + r"\.inverted_conv", fp + ".inverted_conv", norms[0])
    _conv_layer(m, tp + r"\.depth_conv", fp + ".depth_conv", norms[1])
    _conv_layer(m, tp + r"\.point_conv", fp + ".point_conv", norms[2])


def large_backbone_rules(m, depth_list, torch_prefix: str, flax_prefix: str):
    """Mapper rules for an EfficientViTLargeBackbone under the given
    prefixes (shared by the SAM port mapper and the seg/cls zoo)."""
    d = depth_list
    B = torch_prefix + r"\.stages"
    bo = flax_prefix

    _conv_layer(m, B + r"\.0\.op_list\.0", f"{bo}.stage0_stem")
    for j in range(d[0]):
        _conv_layer(m, B + rf"\.0\.op_list\.{j+1}\.main\.conv1", f"{bo}.stage0_block_{j}.conv1")
        _conv_layer(m, B + rf"\.0\.op_list\.{j+1}\.main\.conv2", f"{bo}.stage0_block_{j}.conv2")
    for sid in (1, 2, 3):
        for j in range(d[sid] + 1):
            tp = B + rf"\.{sid}\.op_list\.{j}\.main"
            fp = f"{bo}.stage{sid}_block_{j}"
            if sid <= 2:
                _fmb(m, tp, fp, (True, True))
            else:  # stage3: MBConv fewer-norm (no norm on first two convs)
                _mb(m, tp, fp, (False, False, True))
    # stage 4
    _mb(m, B + r"\.4\.op_list\.0\.main", f"{bo}.stage4_block_0", (False, False, True))
    for j in range(d[4]):
        tp = B + rf"\.4\.op_list\.{j+1}"
        fp = f"{bo}.stage4_vit_{j}"
        _conv_layer(m, tp + r"\.context_module\.main\.qkv", fp + ".context_module.qkv", norm=False)
        m.conv(tp + r"\.context_module\.main\.aggreg\.0\.0", fp + ".context_module.aggreg_0_depth")
        m.conv(tp + r"\.context_module\.main\.aggreg\.0\.1", fp + ".context_module.aggreg_0_point")
        _conv_layer(m, tp + r"\.context_module\.main\.proj", fp + ".context_module.proj")
        _mb(m, tp + r"\.local_module\.main", fp + ".local_module", (False, False, True))


def port_sam_state_dict(sd, cfg: SamConfig = SAM_L2):
    """EfficientViTSam torch state dict → flat {path: array}."""
    from edgestyle_tpu.core.porting import KeyMapper, conv_transpose_kernel

    m = KeyMapper()
    large_backbone_rules(m, cfg.backbone.depth_list, r"image_encoder\.backbone",
                         "image_encoder.backbone")

    # neck (DAG): input_ops 0/1/2 ↔ fids stage4/stage3/stage2
    for i, fid in enumerate(("stage4", "stage3", "stage2")):
        _conv_layer(m, rf"image_encoder\.neck\.input_ops\.{i}\.op_list\.0",
                    f"image_encoder.neck.input_{fid}")
    for j in range(64):  # covers any head depth
        _fmb(m, rf"image_encoder\.neck\.middle\.op_list\.{j}\.main",
             f"image_encoder.neck.middle_{j}")
    _conv_layer(m, r"image_encoder\.neck\.output_ops\.0\.op_list\.0",
                "image_encoder.neck.output_sam_encoder", norm=False)
    m.norm(r"image_encoder\.norm", "image_encoder.norm")

    # prompt encoder
    m.rule(r"prompt_encoder\.pe_layer\.positional_encoding_gaussian_matrix",
           "prompt_encoder.pe_gaussian")
    m.rule(r"prompt_encoder\.point_embeddings\.(\d)\.weight", "_pe_point_\\1")
    m.rule(r"prompt_encoder\.not_a_point_embed\.weight", "_pe_nap")
    m.rule(r"prompt_encoder\.no_mask_embed\.weight", "_pe_nomask")
    m.rule(r"prompt_encoder\.mask_downscaling\..*", "_drop")

    # mask decoder
    md = r"mask_decoder"
    fo = "mask_decoder"
    m.rule(md + r"\.iou_token\.weight", fo + ".iou_token")
    m.rule(md + r"\.mask_tokens\.weight", fo + ".mask_tokens")
    for i in range(2):
        tp = md + rf"\.transformer\.layers\.{i}"
        fp = fo + f".transformer.layers_{i}"
        for attn in ("self_attn", "cross_attn_token_to_image", "cross_attn_image_to_token"):
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                m.linear(tp + rf"\.{attn}\.{proj}", fp + f".{attn}.{proj}")
        for norm in ("norm1", "norm2", "norm3", "norm4"):
            m.norm(tp + rf"\.{norm}", fp + f".{norm}")
        m.linear(tp + r"\.mlp\.lin1", fp + ".mlp_lin1")
        m.linear(tp + r"\.mlp\.lin2", fp + ".mlp_lin2")
    for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
        m.linear(md + rf"\.transformer\.final_attn_token_to_image\.{proj}",
                 fo + f".transformer.final_attn_token_to_image.{proj}")
    m.norm(md + r"\.transformer\.norm_final_attn", fo + ".transformer.norm_final_attn")
    m.rule(md + r"\.output_upscaling\.0\.weight", fo + ".upscale_conv1.kernel",
           conv_transpose_kernel)
    m.rule(md + r"\.output_upscaling\.0\.bias", fo + ".upscale_conv1.bias")
    m.norm(md + r"\.output_upscaling\.1", fo + ".upscale_norm")
    m.rule(md + r"\.output_upscaling\.3\.weight", fo + ".upscale_conv2.kernel",
           conv_transpose_kernel)
    m.rule(md + r"\.output_upscaling\.3\.bias", fo + ".upscale_conv2.bias")
    for i in range(4):
        for j in range(3):
            m.linear(md + rf"\.output_hypernetworks_mlps\.{i}\.layers\.{j}",
                     fo + f".hyper_mlps_{i}.layers_{j}")
    for j in range(3):
        m.linear(md + rf"\.iou_prediction_head\.layers\.{j}", fo + f".iou_mlp.layers_{j}")

    out = m.apply(sd, strict=True)
    # post-fix the prompt-encoder embedding tables
    import numpy as _np

    pts = [out.pop(f"_pe_point_{i}") for i in range(4) if f"_pe_point_{i}" in out]
    if pts:
        out["prompt_encoder.point_embeddings"] = _np.concatenate(pts, axis=0)
    if "_pe_nap" in out:
        out["prompt_encoder.not_a_point_embed"] = out.pop("_pe_nap")[0]
    if "_pe_nomask" in out:
        out["prompt_encoder.no_mask_embed"] = out.pop("_pe_nomask")[0]
    for k in [k for k in out if k == "_drop"]:
        out.pop(k)
    return out
