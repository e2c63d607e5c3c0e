"""OpenPose body estimation + pose rendering, TPU-first.

The reference produces its pose conditioning images with controlnet_aux's
OpenposeDetector (/root/reference/extract_dataset.py:214-295: detect, score
/part-count/anatomy filters, keep the largest person, draw the skeleton).

Split of labor here:
  * Body CNN (VGG-10 trunk + 6 two-branch PAF/heatmap stages — the FLOPs)
    runs in JAX on TPU.
  * Peak finding (local-maxima via max-pool + per-part top-K) and PAF
    line-integral scoring of all candidate limb pairs run in JAX with
    fixed shapes (K peaks per part, 10 integral samples).
  * The person-assembly "subset" merge — a tiny irregular graph algorithm
    over ≤K²·19 scored candidates — runs host-side in numpy (microseconds;
    the reference's equivalent is also pure Python). Conditioning
    rasterization (capsule limbs + keypoint circles as distance fields)
    runs in JAX again.

COCO-18 keypoint order matches the reference's documented map
(extract_dataset.py:196-213).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.core.porting import KeyMapper

NUM_PARTS = 18  # +1 background heatmap channel
NUM_HEAT = 19
NUM_PAF = 38

# limb sequence (1-indexed in the original; converted to 0-indexed pairs)
LIMB_SEQ = [
    (1, 2), (1, 5), (2, 3), (3, 4), (5, 6), (6, 7), (1, 8), (8, 9), (9, 10),
    (1, 11), (11, 12), (12, 13), (1, 0), (0, 14), (14, 16), (0, 15), (15, 17),
    (2, 16), (5, 17),
]
# PAF channel pairs for each limb (0-indexed into the 38 channels)
MAP_IDX = [
    (12, 13), (20, 21), (14, 15), (16, 17), (22, 23), (24, 25), (0, 1), (2, 3),
    (4, 5), (6, 7), (8, 9), (10, 11), (28, 29), (30, 31), (34, 35), (32, 33),
    (36, 37), (18, 19), (26, 27),
]

POSE_COLORS = [
    (255, 0, 0), (255, 85, 0), (255, 170, 0), (255, 255, 0), (170, 255, 0),
    (85, 255, 0), (0, 255, 0), (0, 255, 85), (0, 255, 170), (0, 255, 255),
    (0, 170, 255), (0, 85, 255), (0, 0, 255), (85, 0, 255), (170, 0, 255),
    (255, 0, 255), (255, 0, 170), (255, 0, 85),
]


class _ConvBlock(nn.Module):
    features: Tuple[Tuple[int, int], ...]  # (out_ch, kernel)
    final_relu: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n = len(self.features)
        for i, (ch, k) in enumerate(self.features):
            x = nn.Conv(ch, (k, k), padding=((k // 2, k // 2),) * 2,
                        dtype=self.dtype, name=f"conv_{i}")(x)
            if i < n - 1 or self.final_relu:
                x = jax.nn.relu(x)
        return x


class BodyPoseNet(nn.Module):
    """CMU body_pose_model: VGG trunk → stage1 (3x3 branch) → 5 refine
    stages (7x7 branches) over concat(features, paf, heat)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [-0.5, 0.5] (img/255 - 0.5). H, W multiples of 8.
        Returns (paf (B,H/8,W/8,38), heat (B,H/8,W/8,19))."""
        def conv(ch, k, name):
            return nn.Conv(ch, (k, k), padding=((k // 2, k // 2),) * 2,
                           dtype=self.dtype, name=name)

        pool = lambda y: nn.max_pool(y, (2, 2), (2, 2))
        r = jax.nn.relu
        # VGG trunk
        x = r(conv(64, 3, "conv1_1")(x)); x = r(conv(64, 3, "conv1_2")(x)); x = pool(x)
        x = r(conv(128, 3, "conv2_1")(x)); x = r(conv(128, 3, "conv2_2")(x)); x = pool(x)
        x = r(conv(256, 3, "conv3_1")(x)); x = r(conv(256, 3, "conv3_2")(x))
        x = r(conv(256, 3, "conv3_3")(x)); x = r(conv(256, 3, "conv3_4")(x)); x = pool(x)
        x = r(conv(512, 3, "conv4_1")(x)); x = r(conv(512, 3, "conv4_2")(x))
        x = r(conv(256, 3, "conv4_3_CPM")(x)); feat = r(conv(128, 3, "conv4_4_CPM")(x))

        # stage 1
        paf = _ConvBlock(((128, 3), (128, 3), (128, 3), (512, 1), (NUM_PAF, 1)),
                         dtype=self.dtype, name="stage1_L1")(feat)
        heat = _ConvBlock(((128, 3), (128, 3), (128, 3), (512, 1), (NUM_HEAT, 1)),
                          dtype=self.dtype, name="stage1_L2")(feat)
        # stages 2-6
        for s in range(2, 7):
            inp = jnp.concatenate([paf, heat, feat], axis=-1)
            paf = _ConvBlock(
                ((128, 7),) * 5 + ((128, 1), (NUM_PAF, 1)),
                dtype=self.dtype, name=f"stage{s}_L1",
            )(inp)
            heat = _ConvBlock(
                ((128, 7),) * 5 + ((128, 1), (NUM_HEAT, 1)),
                dtype=self.dtype, name=f"stage{s}_L2",
            )(inp)
        return paf, heat


def port_bodypose_state_dict(sd):
    """controlnet_aux/CMU `body_pose_model.pth` layout → BodyPoseNet params.

    torch names: model0.conv1_1..., model1_1.conv5_1_CPM_L1..., modelX_Y.Mconv...
    """
    m = KeyMapper()
    trunk = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
             "conv3_3", "conv3_4", "conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM"]
    for name in trunk:
        m.conv(rf"model0\.{name}", name)
    for L, blk in ((1, "L1"), (2, "L2")):
        for i in range(1, 6):
            suffix = {1: "1", 2: "2", 3: "3", 4: "4", 5: "5"}[i]
            m.conv(rf"model1_{L}\.conv5_{suffix}_CPM_L{L}", f"stage1_{blk}.conv_{i-1}")
        for s in range(2, 7):
            for i in range(1, 8):
                m.conv(rf"model{s}_{L}\.Mconv{i}_stage{s}_L{L}", f"stage{s}_{blk}.conv_{i-1}")
    return m.apply(sd)


# ----------------------------------------------------------------- decoding
@dataclasses.dataclass(frozen=True)
class DecodeConfig:
    max_peaks: int = 8  # K peaks per part
    thre1: float = 0.1  # heatmap peak threshold
    thre2: float = 0.05  # PAF sample threshold
    num_samples: int = 10  # PAF line-integral samples


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def smooth_heatmaps(heat: jax.Array, sigma: float = 3.0) -> jax.Array:
    """Separable gaussian blur (scipy gaussian_filter equivalent; edge
    padding approximates reflect) as two depthwise convs."""
    radius = int(3 * sigma + 0.5)
    k = _gaussian_kernel1d(sigma, radius)
    c = heat.shape[-1]

    def dw_conv(x, kernel_2d):
        kh, kw = kernel_2d.shape
        kern = jnp.broadcast_to(kernel_2d[:, :, None, None], (kh, kw, 1, c))
        x = jnp.pad(
            x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)), mode="edge"
        )
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    x = dw_conv(heat, k[:, None])
    return dw_conv(x, k[None, :])


class Peaks(NamedTuple):
    xy: jax.Array  # (B, 18, K, 2) float — x, y in heatmap pixels
    score: jax.Array  # (B, 18, K)
    valid: jax.Array  # (B, 18, K) bool


def find_peaks(heat: jax.Array, cfg: DecodeConfig = DecodeConfig()) -> Peaks:
    """Local maxima (4-neighbourhood) above thre1, top-K per part."""
    hm = heat[..., :NUM_PARTS]
    b, h, w, c = hm.shape
    pad = jnp.pad(hm, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-1e9)
    is_peak = (
        (hm >= pad[:, :-2, 1:-1]) & (hm >= pad[:, 2:, 1:-1])
        & (hm >= pad[:, 1:-1, :-2]) & (hm >= pad[:, 1:-1, 2:])
        & (hm > cfg.thre1)
    )
    scores = jnp.where(is_peak, hm, -1e9)
    flat = scores.transpose(0, 3, 1, 2).reshape(b, c, h * w)
    top, idx = jax.lax.top_k(flat, cfg.max_peaks)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return Peaks(
        xy=jnp.stack([xs, ys], axis=-1),
        score=top,
        valid=top > cfg.thre1,
    )


def score_limb_candidates(
    paf: jax.Array, peaks: Peaks, cfg: DecodeConfig = DecodeConfig()
) -> Tuple[jax.Array, jax.Array]:
    """Score all K×K candidate (partA→partB) connections for all 19 limbs.

    Returns (scores (B,19,K,K), ok (B,19,K,K)): the PAF line-integral score
    with distance prior, and the dual criterion mask (≥80% samples above
    thre2 AND positive prior-adjusted score), mirroring the original
    algorithm's candidate scoring."""
    b, h, w, _ = paf.shape
    limb_a = jnp.array([l[0] for l in LIMB_SEQ])
    limb_b = jnp.array([l[1] for l in LIMB_SEQ])
    paf_x_idx = jnp.array([m[0] for m in MAP_IDX])
    paf_y_idx = jnp.array([m[1] for m in MAP_IDX])

    a_xy = peaks.xy[:, limb_a]  # (B, 19, K, 2)
    b_xy = peaks.xy[:, limb_b]
    a_val = peaks.valid[:, limb_a]
    b_val = peaks.valid[:, limb_b]

    pa = a_xy[:, :, :, None, :]  # (B,19,K,1,2)
    pb = b_xy[:, :, None, :, :]  # (B,19,1,K,2)
    vec = pb - pa  # (B,19,K,K,2)
    norm = jnp.sqrt(jnp.sum(vec**2, axis=-1)) + 1e-8
    u = vec / norm[..., None]

    ts = jnp.linspace(0.0, 1.0, cfg.num_samples)
    pts = pa[..., None, :] + vec[..., None, :] * ts[:, None]  # (B,19,K,K,S,2)
    px = jnp.clip(jnp.round(pts[..., 0]), 0, w - 1).astype(jnp.int32)
    py = jnp.clip(jnp.round(pts[..., 1]), 0, h - 1).astype(jnp.int32)

    def gather(pf, cx, cy, xi, yi):
        # pf: (H,W,38); xi/yi: (19,K,K,S); cx/cy: (19,)
        vx = pf[yi, xi, cx[:, None, None, None]]
        vy = pf[yi, xi, cy[:, None, None, None]]
        return vx, vy

    vx, vy = jax.vmap(gather, in_axes=(0, None, None, 0, 0))(
        paf, paf_x_idx, paf_y_idx, px, py
    )
    dot = vx * u[..., None, 0] + vy * u[..., None, 1]  # (B,19,K,K,S)
    mean_score = jnp.mean(dot, axis=-1)
    prior = jnp.minimum(0.5 * h / norm - 1.0, 0.0)
    with_prior = mean_score + prior
    crit1 = jnp.mean((dot > cfg.thre2).astype(jnp.float32), axis=-1) > 0.8
    ok = crit1 & (with_prior > 0) & a_val[:, :, :, None] & b_val[:, :, None, :]
    return with_prior, ok


def assemble_people_host(
    peaks: Peaks, limb_scores: np.ndarray, limb_ok: np.ndarray, max_people: int = 10
) -> List[dict]:
    """Greedy per-limb matching + subset merge (host-side numpy; the
    original algorithm's semantics on fixed-size candidate grids).

    Returns a list of people dicts: {keypoints: (18,2) float or nan,
    scores: (18,), total_score, total_parts} in heatmap coordinates."""
    xy = np.asarray(peaks.xy[0])
    kscore = np.asarray(peaks.score[0])
    valid = np.asarray(peaks.valid[0])
    K = xy.shape[1]

    # global peak ids
    peak_id = np.arange(NUM_PARTS * K).reshape(NUM_PARTS, K)
    subset = []  # each: dict part->peak flat index, score acc

    connections = []  # per limb: list of (ia, ib, score)
    for l, (a, b) in enumerate(LIMB_SEQ):
        cand = [
            (limb_scores[0, l, i, j], i, j)
            for i in range(K)
            for j in range(K)
            if limb_ok[0, l, i, j]
        ]
        cand.sort(reverse=True)
        used_a, used_b, conns = set(), set(), []
        for s, i, j in cand:
            if i not in used_a and j not in used_b:
                used_a.add(i)
                used_b.add(j)
                conns.append((i, j, float(s)))
        connections.append(conns)

    # subset merge
    people: List[dict] = []
    for l, (a, b) in enumerate(LIMB_SEQ[:17]):  # last 2 limbs are ear-shoulder extras
        for i, j, s in connections[l]:
            pa, pb = peak_id[a, i], peak_id[b, j]
            found = [p for p in people if p["parts"].get(a) == pa or p["parts"].get(b) == pb]
            if not found:
                person = {"parts": {a: pa, b: pb}, "score": s + kscore[a, i] + kscore[b, j]}
                people.append(person)
            elif len(found) == 1:
                p = found[0]
                if p["parts"].get(b) is None:
                    p["parts"][b] = pb
                    p["score"] += s + kscore[b, j]
                elif p["parts"].get(a) is None:
                    p["parts"][a] = pa
                    p["score"] += s + kscore[a, i]
            else:
                p1, p2 = found[0], found[1]
                if not (set(p1["parts"]) & set(p2["parts"])):
                    p1["parts"].update(p2["parts"])
                    p1["score"] += p2["score"] + s
                    people.remove(p2)

    out = []
    for p in people:
        kp = np.full((NUM_PARTS, 2), np.nan, np.float32)
        ks = np.zeros(NUM_PARTS, np.float32)
        for part, pid in p["parts"].items():
            pi, ki = divmod(int(pid), K)
            if valid[pi, ki]:
                kp[part] = xy[pi, ki]
                ks[part] = kscore[pi, ki]
        n_parts = int(np.isfinite(kp[:, 0]).sum())
        out.append(
            {
                "keypoints": kp,
                "scores": ks,
                "total_score": float(p["score"]),
                "total_parts": n_parts,
            }
        )
    out.sort(key=lambda q: q["total_score"], reverse=True)
    return out[:max_people]


def filter_and_pick_largest(people: List[dict]) -> Optional[dict]:
    """The reference's filters (extract_dataset.py:223-267): score>10,
    parts>5, has head evidence, has a shoulder, has a hip; pick largest
    bounding-box area."""
    def has(p, idxs):
        return any(np.isfinite(p["keypoints"][i, 0]) for i in idxs)

    cands = [
        p for p in people
        if p["total_score"] > 10 and p["total_parts"] > 5
        and has(p, [0, 1, 14, 15, 16, 17]) and has(p, [2, 5]) and has(p, [8, 11])
    ]
    if not cands:
        return None

    def area(p):
        k = p["keypoints"]
        fin = np.isfinite(k[:, 0])
        if fin.sum() < 2:
            return 0.0
        xs, ys = k[fin, 0], k[fin, 1]
        return float((xs.max() - xs.min()) * (ys.max() - ys.min()))

    return max(cands, key=area)


# ---------------------------------------------------------------- rendering
def render_pose(
    keypoints01: jax.Array, canvas_hw: Tuple[int, int] = (512, 512),
    stickwidth: float = 4.0, radius: float = 4.0,
) -> jax.Array:
    """Rasterize a skeleton as the standard OpenPose conditioning image.

    keypoints01: (18, 2) in [0,1] image coords (NaN → missing). Returns
    (H, W, 3) float32 in [0,1] on black. Limbs are capsules (distance field
    to segment < stickwidth) at 0.6 intensity, joints are full-intensity
    circles — matching draw_bodypose's look."""
    h, w = canvas_hw
    kp = keypoints01 * jnp.array([w, h], jnp.float32)
    ys, xs = jnp.mgrid[0:h, 0:w]
    pix = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)  # (H,W,2)

    canvas = jnp.zeros((h, w, 3), jnp.float32)
    colors = jnp.asarray(POSE_COLORS, jnp.float32) / 255.0

    # limbs (first 17, like draw_bodypose)
    for l, (a, b) in enumerate(LIMB_SEQ[:17]):
        pa, pb = kp[a], kp[b]
        ok = jnp.isfinite(pa).all() & jnp.isfinite(pb).all()
        pa = jnp.nan_to_num(pa)
        pb = jnp.nan_to_num(pb)
        ab = pb - pa
        denom = jnp.maximum(jnp.sum(ab * ab), 1e-6)
        t = jnp.clip(jnp.sum((pix - pa) * ab, axis=-1) / denom, 0.0, 1.0)
        proj = pa + t[..., None] * ab
        d = jnp.sqrt(jnp.sum((pix - proj) ** 2, axis=-1))
        m = (d < stickwidth) & ok
        canvas = jnp.where(m[..., None], jnp.maximum(canvas, colors[l] * 0.6), canvas)

    # joints
    for i in range(NUM_PARTS):
        p = kp[i]
        ok = jnp.isfinite(p).all()
        p = jnp.nan_to_num(p)
        d = jnp.sqrt(jnp.sum((pix - p) ** 2, axis=-1))
        m = (d < radius) & ok
        canvas = jnp.where(m[..., None], colors[i], canvas)
    return canvas


def preprocess_for_openpose(img01: jax.Array, target: int = 184) -> jax.Array:
    """(B,H,W,3) [0,1] → resized to the detector's working scale (the
    original runs at scale 0.5·368/H), value range [-0.5, 0.5], size padded
    to a multiple of 8."""
    b = img01.shape[0]
    t8 = (target + 7) // 8 * 8
    x = jax.image.resize(img01, (b, t8, t8, 3), method="bilinear")
    return x - 0.5
