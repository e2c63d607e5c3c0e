"""Full-model torch mirror of EfficientViT-SAM (backbone + neck + SAM
prompt encoder + mask decoder) — the network EdgeStyle's extraction and
segmenter stack runs (/root/reference/extract_dataset.py:60-90,
/root/reference/efficientvit/models/efficientvit/sam.py).

Written from the published EfficientViT (ICCV'23) and SAM architecture
specs, NOT from the JAX code: conv stem + ResBlocks, FusedMBConv/MBConv
conv stages (first block stride-2 expand-16, fewer-norm from stage 3),
LiteMLA attention stage, the SamNeck DAG (1x1+bn per stage feature →
bicubic to 64² → add → FusedMBConv middle → 1x1 out), and SAM's
prompt-encoder / two-way-transformer mask decoder. Module attribute
names are chosen so ``state_dict()`` emits the exact upstream key layout
(`image_encoder.backbone.stages.{s}.op_list.{j}.main...`,
`mask_decoder.output_upscaling.0.weight`, …) that
`port_sam_state_dict` consumes from the real han-cai checkpoints — so
full-model parity also exercises the port mapper end-to-end (tier C in
PARITY.md; block-level pinning lives in tests/test_efficientvit.py).
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn

GELU_TANH = nn.GELU(approximate="tanh")  # efficientvit act registry
GELU_EXACT = nn.GELU()  # SAM decoder


class LayerNorm2dT(nn.LayerNorm):
    """Channel-only LN at each spatial position (efficientvit norm.py:16)."""

    def forward(self, x):
        out = x - torch.mean(x, dim=1, keepdim=True)
        out = out / torch.sqrt(torch.square(out).mean(dim=1, keepdim=True) + self.eps)
        return out * self.weight.view(1, -1, 1, 1) + self.bias.view(1, -1, 1, 1)


ACTS = {"gelu": GELU_TANH, "hswish": nn.Hardswish(), None: None}


class ConvLayerT(nn.Module):
    def __init__(self, cin, cout, k=3, stride=1, groups=1, bias=False,
                 norm="bn", act="gelu"):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, stride, padding=k // 2,
                              groups=groups, bias=bias)
        self.norm = nn.BatchNorm2d(cout) if norm == "bn" else None
        self.act = ACTS[act]

    def forward(self, x):
        x = self.conv(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.act is not None:
            x = self.act(x)
        return x


class ResidualT(nn.Module):
    """Upstream ResidualBlock: y = main(x) (+ x when shortcut)."""

    def __init__(self, main, shortcut=False):
        super().__init__()
        self.main = main
        self.use_shortcut = shortcut

    def forward(self, x):
        y = self.main(x)
        return x + y if self.use_shortcut else y


class OpSeqT(nn.Module):
    def __init__(self, ops):
        super().__init__()
        self.op_list = nn.ModuleList(ops)

    def forward(self, x):
        for op in self.op_list:
            x = op(x)
        return x


class ResBlockT(nn.Module):
    def __init__(self, c, expand=1):
        super().__init__()
        mid = round(c * expand)
        self.conv1 = ConvLayerT(c, mid, 3, norm="bn", act="gelu")
        self.conv2 = ConvLayerT(mid, c, 3, norm="bn", act=None)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class FusedMBConvT(nn.Module):
    def __init__(self, cin, cout, stride=1, expand=1, fewer_norm=False):
        super().__init__()
        mid = round(cin * expand)
        self.spatial_conv = ConvLayerT(cin, mid, 3, stride, bias=fewer_norm,
                                       norm=None if fewer_norm else "bn", act="gelu")
        self.point_conv = ConvLayerT(mid, cout, 1, norm="bn", act=None)

    def forward(self, x):
        return self.point_conv(self.spatial_conv(x))


class MBConvT(nn.Module):
    def __init__(self, cin, cout, stride=1, expand=6, fewer_norm=False, act="gelu"):
        super().__init__()
        mid = round(cin * expand)
        nb = fewer_norm
        self.inverted_conv = ConvLayerT(cin, mid, 1, bias=nb,
                                        norm=None if nb else "bn", act=act)
        self.depth_conv = ConvLayerT(mid, mid, 3, stride, groups=mid, bias=nb,
                                     norm=None if nb else "bn", act=act)
        self.point_conv = ConvLayerT(mid, cout, 1, norm="bn", act=None)

    def forward(self, x):
        return self.point_conv(self.depth_conv(self.inverted_conv(x)))


class LiteMLAT(nn.Module):
    """Relu-linear multi-scale attention (efficientvit ops.py:334-447)."""

    def __init__(self, c, dim=32, scales=(5,), eps=1e-15):
        super().__init__()
        self.dim, self.eps = dim, eps
        heads = c // dim
        total = heads * dim
        self.qkv = ConvLayerT(c, 3 * total, 1, norm=None, act=None)
        self.aggreg = nn.ModuleList([
            nn.Sequential(
                nn.Conv2d(3 * total, 3 * total, s, padding=s // 2,
                          groups=3 * total, bias=False),
                nn.Conv2d(3 * total, 3 * total, 1, groups=3 * heads, bias=False),
            )
            for s in scales
        ])
        self.proj = ConvLayerT(3 * total * (1 + len(scales)) // 3, c, 1,
                               norm="bn", act=None)

    def _attn(self, qkv):
        b, c, h, w = qkv.shape
        n, d = h * w, self.dim
        heads = c // (3 * d)
        x = qkv.float().reshape(b, heads, 3 * d, n).transpose(-1, -2)  # (b,hd,n,3d)
        q, k, v = x[..., :d], x[..., d : 2 * d], x[..., 2 * d :]
        q, k = F.relu(q), F.relu(k)
        v1 = torch.cat([v, torch.ones_like(v[..., :1])], dim=-1)
        kv = torch.einsum("bhnd,bhne->bhde", k, v1)
        out = torch.einsum("bhnd,bhde->bhne", q, kv)
        out = out[..., :-1] / (out[..., -1:] + self.eps)
        return out.transpose(-1, -2).reshape(b, heads * d, h, w)

    def forward(self, x):
        qkv = self.qkv(x)
        multi = [qkv] + [agg(qkv) for agg in self.aggreg]
        out = torch.cat([self._attn(m).to(x.dtype) for m in multi], dim=1)
        return self.proj(out)


class EfficientViTBlockT(nn.Module):
    def __init__(self, c, dim=32, expand=6, act="gelu"):
        super().__init__()
        self.context_module = ResidualT(LiteMLAT(c, dim), shortcut=True)
        self.local_module = ResidualT(
            MBConvT(c, c, expand=expand, fewer_norm=True, act=act), shortcut=True
        )

    def forward(self, x):
        return self.local_module(self.context_module(x))


class BackboneT(nn.Module):
    """EfficientViTLargeBackbone (efficientvit backbone.py:203-338)."""

    def __init__(self, widths, depths, qkv_dim=32):
        super().__init__()
        w, d = widths, depths
        stages = []
        # stage 0: stem + d0 residual ResBlocks
        s0 = [ConvLayerT(3, w[0], 3, 2, norm="bn", act="gelu")]
        s0 += [ResidualT(ResBlockT(w[0]), shortcut=True) for _ in range(d[0])]
        stages.append(OpSeqT(s0))
        # stages 1-3
        cin = w[0]
        for sid in (1, 2, 3):
            ops = []
            for j in range(d[sid] + 1):
                stride = 2 if j == 0 else 1
                expand = 16 if stride == 2 else 4
                if sid <= 2:
                    blk = FusedMBConvT(cin if j == 0 else w[sid], w[sid],
                                       stride, expand, fewer_norm=sid > 2)
                else:
                    blk = MBConvT(cin if j == 0 else w[sid], w[sid], stride,
                                  expand, fewer_norm=True)
                ops.append(ResidualT(blk, shortcut=stride == 1))
            cin = w[sid]
            stages.append(OpSeqT(ops))
        # stage 4: stride-2 MBConv(24, fewer-norm) + vit blocks
        s4 = [ResidualT(MBConvT(cin, w[4], 2, 24, fewer_norm=True), shortcut=False)]
        s4 += [EfficientViTBlockT(w[4], qkv_dim) for _ in range(d[4])]
        stages.append(OpSeqT(s4))
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        feats = {}
        for sid, stage in enumerate(self.stages):
            x = stage(x)
            feats[f"stage{sid}"] = x
        return feats


class SamNeckT(nn.Module):
    def __init__(self, in_channels, head_depth, head_width=256, out_dim=256,
                 feature_hw=64):
        super().__init__()
        self.feature_hw = feature_hw
        self.input_ops = nn.ModuleList([
            OpSeqT([ConvLayerT(c, head_width, 1, norm="bn", act=None)])
            for c in in_channels
        ])
        self.middle = OpSeqT([
            ResidualT(FusedMBConvT(head_width, head_width, expand=1), shortcut=True)
            for _ in range(head_depth)
        ])
        self.output_ops = nn.ModuleList([
            OpSeqT([ConvLayerT(head_width, out_dim, 1, bias=True,
                               norm=None, act=None)])
        ])

    def forward(self, feats):  # feats: [stage4, stage3, stage2]
        merged = None
        for op, f in zip(self.input_ops, feats):
            y = op(f)
            if y.shape[-1] != self.feature_hw:
                y = F.interpolate(y, size=(self.feature_hw, self.feature_hw),
                                  mode="bicubic", align_corners=False)
            merged = y if merged is None else merged + y
        return self.output_ops[0](self.middle(merged))


class ImageEncoderT(nn.Module):
    def __init__(self, widths, depths, neck_depth, qkv_dim=32):
        super().__init__()
        self.backbone = BackboneT(widths, depths, qkv_dim)
        self.neck = SamNeckT((widths[4], widths[3], widths[2]), neck_depth)
        self.norm = LayerNorm2dT(256)

    def forward(self, x):
        feats = self.backbone(x)
        y = self.neck([feats["stage4"], feats["stage3"], feats["stage2"]])
        return self.norm(y)


class PELayerT(nn.Module):
    def __init__(self, dim=256):
        super().__init__()
        self.register_buffer(
            "positional_encoding_gaussian_matrix", torch.zeros(2, dim // 2)
        )

    def pe(self, coords01):
        c = 2.0 * coords01 - 1.0
        proj = (2.0 * math.pi) * (c @ self.positional_encoding_gaussian_matrix)
        return torch.cat([torch.sin(proj), torch.cos(proj)], dim=-1)


class PromptEncoderT(nn.Module):
    def __init__(self, dim=256, input_size=1024, grid=64):
        super().__init__()
        self.input_size, self.grid = input_size, grid
        self.pe_layer = PELayerT(dim)
        self.point_embeddings = nn.ModuleList(
            [nn.Embedding(1, dim) for _ in range(4)]
        )
        self.not_a_point_embed = nn.Embedding(1, dim)
        self.no_mask_embed = nn.Embedding(1, dim)
        # unused by the box/point path; present in the upstream layout
        self.mask_downscaling = nn.Sequential(
            nn.Conv2d(1, 4, 2, 2), LayerNorm2dT(4), GELU_EXACT,
            nn.Conv2d(4, 16, 2, 2), LayerNorm2dT(16), GELU_EXACT,
            nn.Conv2d(16, dim, 1),
        )

    def dense_pe(self):
        g = self.grid
        ys = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        xs = (torch.arange(g, dtype=torch.float32) + 0.5) / g
        gx, gy = torch.meshgrid(xs, ys, indexing="xy")
        return self.pe_layer.pe(torch.stack([gx, gy], dim=-1))  # (g,g,256)

    def forward(self, points, labels):
        coords = (points + 0.5) / self.input_size
        pe = self.pe_layer.pe(coords)
        lbl = labels[..., None]
        emb = torch.where(lbl == -1, self.not_a_point_embed.weight[0], pe)
        for i in range(4):
            emb = emb + torch.where(
                lbl == i, self.point_embeddings[i].weight[0],
                torch.zeros(()),
            )
        b = points.shape[0]
        dense = self.no_mask_embed.weight[0].view(1, -1, 1, 1).expand(
            b, -1, self.grid, self.grid
        )
        return emb, dense


class AttentionT(nn.Module):
    def __init__(self, dim=256, heads=8, downsample_rate=1):
        super().__init__()
        d = dim // downsample_rate
        self.heads = heads
        self.q_proj = nn.Linear(dim, d)
        self.k_proj = nn.Linear(dim, d)
        self.v_proj = nn.Linear(dim, d)
        self.out_proj = nn.Linear(d, dim)

    def forward(self, q, k, v):
        hq, hk, hv = self.q_proj(q), self.k_proj(k), self.v_proj(v)
        b, nq, d = hq.shape
        nk = hk.shape[1]
        hd = d // self.heads
        qh = hq.reshape(b, nq, self.heads, hd).transpose(1, 2)
        kh = hk.reshape(b, nk, self.heads, hd).transpose(1, 2)
        vh = hv.reshape(b, nk, self.heads, hd).transpose(1, 2)
        logits = qh @ kh.transpose(-1, -2) / math.sqrt(hd)
        probs = torch.softmax(logits.float(), dim=-1).to(vh.dtype)
        o = (probs @ vh).transpose(1, 2).reshape(b, nq, d)
        return self.out_proj(o)


class MLPBlockT(nn.Module):
    def __init__(self, dim=256, mlp_dim=2048):
        super().__init__()
        self.lin1 = nn.Linear(dim, mlp_dim)
        self.lin2 = nn.Linear(mlp_dim, dim)

    def forward(self, x):
        return self.lin2(F.relu(self.lin1(x)))


class TwoWayBlockT(nn.Module):
    def __init__(self, skip_first_layer_pe=False):
        super().__init__()
        self.self_attn = AttentionT()
        self.norm1 = nn.LayerNorm(256)
        self.cross_attn_token_to_image = AttentionT(downsample_rate=2)
        self.norm2 = nn.LayerNorm(256)
        self.mlp = MLPBlockT()
        self.norm3 = nn.LayerNorm(256)
        self.cross_attn_image_to_token = AttentionT(downsample_rate=2)
        self.norm4 = nn.LayerNorm(256)
        self.skip_first_layer_pe = skip_first_layer_pe

    def forward(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = self.self_attn(queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + self.self_attn(q, q, queries)
        queries = self.norm1(queries)
        q = queries + query_pe
        k = keys + key_pe
        queries = self.norm2(
            queries + self.cross_attn_token_to_image(q, k, keys)
        )
        queries = self.norm3(queries + self.mlp(queries))
        q = queries + query_pe
        k = keys + key_pe
        keys = self.norm4(keys + self.cross_attn_image_to_token(k, q, queries))
        return queries, keys


class TwoWayTransformerT(nn.Module):
    def __init__(self, depth=2):
        super().__init__()
        self.layers = nn.ModuleList(
            [TwoWayBlockT(skip_first_layer_pe=i == 0) for i in range(depth)]
        )
        self.final_attn_token_to_image = AttentionT(downsample_rate=2)
        self.norm_final_attn = nn.LayerNorm(256)

    def forward(self, image_embedding, image_pe, point_embedding):
        b, c, h, w = image_embedding.shape
        keys = image_embedding.flatten(2).permute(0, 2, 1)
        key_pe = image_pe.flatten(2).permute(0, 2, 1).expand(b, -1, -1)
        queries = point_embedding
        for layer in self.layers:
            queries, keys = layer(queries, keys, point_embedding, key_pe)
        q = queries + point_embedding
        k = keys + key_pe
        queries = self.norm_final_attn(
            queries + self.final_attn_token_to_image(q, k, keys)
        )
        return queries, keys


class MLPt(nn.Module):
    def __init__(self, cin, hidden, out, depth):
        super().__init__()
        dims = [cin] + [hidden] * (depth - 1) + [out]
        self.layers = nn.ModuleList(
            [nn.Linear(a, b) for a, b in zip(dims[:-1], dims[1:])]
        )

    def forward(self, x):
        for i, lin in enumerate(self.layers):
            x = lin(x)
            if i < len(self.layers) - 1:
                x = F.relu(x)
        return x


class MaskDecoderT(nn.Module):
    def __init__(self, num_multimask=3):
        super().__init__()
        self.n_mask_tokens = num_multimask + 1
        self.iou_token = nn.Embedding(1, 256)
        self.mask_tokens = nn.Embedding(self.n_mask_tokens, 256)
        self.transformer = TwoWayTransformerT()
        self.output_upscaling = nn.Sequential(
            nn.ConvTranspose2d(256, 64, 2, 2), LayerNorm2dT(64), GELU_EXACT,
            nn.ConvTranspose2d(64, 32, 2, 2), GELU_EXACT,
        )
        self.output_hypernetworks_mlps = nn.ModuleList(
            [MLPt(256, 256, 32, 3) for _ in range(self.n_mask_tokens)]
        )
        self.iou_prediction_head = MLPt(256, 256, self.n_mask_tokens, 3)

    def forward(self, image_embeddings, image_pe, sparse, dense,
                multimask_output=True):
        b = sparse.shape[0]
        out_tokens = torch.cat(
            [self.iou_token.weight, self.mask_tokens.weight], dim=0
        )
        tokens = torch.cat([out_tokens.unsqueeze(0).expand(b, -1, -1), sparse], dim=1)
        src = image_embeddings + dense
        hs, src_out = self.transformer(src, image_pe, tokens)
        iou_tok = hs[:, 0]
        mask_toks = hs[:, 1 : 1 + self.n_mask_tokens]
        grid = src_out.transpose(1, 2).reshape(b, 256, 64, 64)
        up = self.output_upscaling(grid)  # (b,32,256,256)
        hyper = torch.stack(
            [m(mask_toks[:, i]) for i, m in enumerate(self.output_hypernetworks_mlps)],
            dim=1,
        )  # (b, M, 32)
        masks = (hyper @ up.flatten(2)).view(b, -1, 256, 256)
        iou = self.iou_prediction_head(iou_tok)
        if multimask_output:
            return masks[:, 1:], iou[:, 1:]
        return masks[:, :1], iou[:, :1]


class EfficientViTSamT(nn.Module):
    """Assembly matching EfficientViTSam (JAX) / upstream predictor flow."""

    def __init__(self, widths=(32, 64, 128, 256, 512), depths=(1, 2, 2, 8, 8),
                 neck_depth=12, qkv_dim=32):
        super().__init__()
        self.image_encoder = ImageEncoderT(widths, depths, neck_depth, qkv_dim)
        self.prompt_encoder = PromptEncoderT()
        self.mask_decoder = MaskDecoderT()
        # the reference zoo runs every SAM norm at eps 1e-6
        set_norm_eps_t(self, 1e-6)

    def forward(self, image, points, labels, multimask_output=True):
        emb = self.image_encoder(image)
        sparse, dense = self.prompt_encoder(points, labels)
        image_pe = self.prompt_encoder.dense_pe().permute(2, 0, 1).unsqueeze(0)
        return self.mask_decoder(emb, image_pe, sparse, dense, multimask_output)


# ---------------------------------------------------------------------------
# b-series backbone + seg/cls heads (efficientvit backbone.py:37-160,
# seg.py:34-106, cls.py:28-51) — the remaining model-zoo surface.
# ---------------------------------------------------------------------------


class DSConvT(nn.Module):
    def __init__(self, c, act="hswish"):
        super().__init__()
        self.depth_conv = ConvLayerT(c, c, 3, groups=c, norm="bn", act=act)
        self.point_conv = ConvLayerT(c, c, 1, norm="bn", act=None)

    def forward(self, x):
        return self.point_conv(self.depth_conv(x))


class BBackboneT(nn.Module):
    """EfficientViTBackbone (b-series): input_stem + 4 stages."""

    def __init__(self, widths, depths, dim=16, expand=4, act="hswish"):
        super().__init__()
        w, d = widths, depths
        stem = [ConvLayerT(3, w[0], 3, 2, norm="bn", act=act)]
        stem += [ResidualT(DSConvT(w[0], act), shortcut=True) for _ in range(d[0])]
        self.input_stem = OpSeqT(stem)
        stages = []
        cin = w[0]
        for sid in (1, 2):
            ops = []
            for i in range(d[sid]):
                stride = 2 if i == 0 else 1
                ops.append(ResidualT(
                    MBConvT(cin if i == 0 else w[sid], w[sid], stride, expand,
                            act=act),
                    shortcut=stride == 1,
                ))
            cin = w[sid]
            stages.append(OpSeqT(ops))
        for sid in (3, 4):
            ops = [ResidualT(
                MBConvT(cin, w[sid], 2, expand, fewer_norm=True, act=act),
                shortcut=False,
            )]
            ops += [EfficientViTBlockT(w[sid], dim, expand, act)
                    for _ in range(d[sid])]
            cin = w[sid]
            stages.append(OpSeqT(ops))
        self.stages = nn.ModuleList(stages)

    def forward(self, x):
        feats = {"stage0": self.input_stem(x)}
        x = feats["stage0"]
        for sid, stage in enumerate(self.stages, 1):
            x = stage(x)
            feats[f"stage{sid}"] = x
        feats["stage_final"] = x
        return feats


class SegHeadT(nn.Module):
    """DAGBlock layout: input_ops (stage4/3/2; bare conv when factor==1),
    middle residual MBConvs, output_ops [final_expand?, classifier]."""

    def __init__(self, in_chs, head_width, head_depth, n_classes,
                 expand=4, final_expand=4, act="hswish", middle_op="mbconv"):
        super().__init__()
        c4, c3, c2 = in_chs
        self.input_ops = nn.ModuleList([
            OpSeqT([ConvLayerT(c4, head_width, 1, norm="bn", act=None)]),
            OpSeqT([ConvLayerT(c3, head_width, 1, norm="bn", act=None)]),
            ConvLayerT(c2, head_width, 1, norm="bn", act=None),  # factor 1
        ])
        mk = (lambda: MBConvT(head_width, head_width, expand=expand, act=act)
              ) if middle_op == "mbconv" else (
              lambda: FusedMBConvT(head_width, head_width, expand=expand))
        self.middle = OpSeqT([
            ResidualT(mk(), shortcut=True) for _ in range(head_depth)
        ])
        out_ops = []
        if final_expand is not None:
            out_ops.append(ConvLayerT(head_width, head_width * final_expand, 1,
                                      norm="bn", act=act))
        out_ops.append(ConvLayerT(head_width * (final_expand or 1), n_classes,
                                  1, bias=True, norm=None, act=None))
        self.output_ops = nn.ModuleList([OpSeqT(out_ops)])

    def forward(self, feats):
        target = feats["stage2"].shape[-2:]
        merged = None
        for op, fid in zip(self.input_ops, ("stage4", "stage3", "stage2")):
            y = op(feats[fid])
            if y.shape[-2:] != target:
                y = F.interpolate(y, size=target, mode="bicubic",
                                  align_corners=False)
            merged = y if merged is None else merged + y
        return self.output_ops[0](self.middle(merged))


class LinearLayerT(nn.Module):
    def __init__(self, cin, cout, bias=True, norm=None, act=None):
        super().__init__()
        self.linear = nn.Linear(cin, cout, bias)
        self.norm = nn.LayerNorm(cout) if norm == "ln" else None
        self.act = ACTS[act]

    def forward(self, x):
        x = self.linear(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.act is not None:
            x = self.act(x)
        return x


class _PoolT(nn.Module):
    def forward(self, x):
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


class ClsHeadT(nn.Module):
    def __init__(self, cin, widths, n_classes=1000, act="hswish"):
        super().__init__()
        self.op_list = nn.ModuleList([
            ConvLayerT(cin, widths[0], 1, norm="bn", act=act),
            _PoolT(),
            LinearLayerT(widths[0], widths[1], bias=False, norm="ln", act=act),
            LinearLayerT(widths[1], n_classes, bias=True),
        ])

    def forward(self, feats):
        x = feats["stage_final"]
        for op in self.op_list:
            x = op(x)
        return x


class EfficientViTSegT(nn.Module):
    def __init__(self, backbone, head):
        super().__init__()
        self.backbone = backbone
        self.head = head

    def forward(self, x):
        return self.head(self.backbone(x))


EfficientViTClsT = EfficientViTSegT  # same backbone/head assembly


def set_norm_eps_t(model: nn.Module, eps: float) -> None:
    """Reference set_norm_eps (efficientvit norm.py:136-140)."""
    for m in model.modules():
        if isinstance(m, (nn.LayerNorm, nn.modules.batchnorm._BatchNorm)):
            m.eps = eps
