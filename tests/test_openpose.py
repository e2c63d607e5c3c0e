"""OpenPose tests: CNN output geometry + torch parity of the trunk port,
synthetic-field decoding (peaks → PAF scoring → assembly → filters), and
skeleton rasterization."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.openpose import (
    DecodeConfig,
    LIMB_SEQ,
    MAP_IDX,
    BodyPoseNet,
    assemble_people_host,
    filter_and_pick_largest,
    find_peaks,
    port_bodypose_state_dict,
    preprocess_for_openpose,
    render_pose,
    score_limb_candidates,
    smooth_heatmaps,
)


def test_bodypose_net_shapes():
    net = BodyPoseNet()
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.eval_shape(net.init, jax.random.key(0), x)
    paf, heat = jax.eval_shape(lambda p, x: net.apply(p, x), params, x)
    assert paf.shape == (1, 8, 8, 38)
    assert heat.shape == (1, 8, 8, 19)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # CMU body_pose_model has ~52.3M params
    assert 52_000_000 < n < 53_000_000, n


def test_port_mapper_covers_cmu_layout():
    # build a synthetic state dict with the CMU naming and check full coverage
    names = []
    trunk = ["conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
             "conv3_3", "conv3_4", "conv4_1", "conv4_2", "conv4_3_CPM", "conv4_4_CPM"]
    for t in trunk:
        names.append(f"model0.{t}")
    for L in (1, 2):
        for i in range(1, 6):
            names.append(f"model1_{L}.conv5_{i}_CPM_L{L}")
        for s in range(2, 7):
            for i in range(1, 8):
                names.append(f"model{s}_{L}.Mconv{i}_stage{s}_L{L}")
    sd = {}
    for n in names:
        sd[n + ".weight"] = np.zeros((4, 3, 3, 3), np.float32)
        sd[n + ".bias"] = np.zeros((4,), np.float32)
    out = port_bodypose_state_dict(sd)  # strict: raises if any key unmapped
    assert len(out) == len(sd)


def test_smooth_heatmaps_matches_torch_conv(rng):
    x = rng.standard_normal((1, 32, 32, 2)).astype(np.float32)
    out = smooth_heatmaps(jnp.asarray(x), sigma=3.0)
    assert out.shape == x.shape
    # blurring reduces total variation
    tv = lambda a: np.abs(np.diff(a, axis=1)).sum()
    assert tv(np.asarray(out)) < tv(x)
    # peak location preserved for an isolated spike
    spike = np.zeros((1, 33, 33, 1), np.float32)
    spike[0, 16, 16, 0] = 1.0
    sm = np.asarray(smooth_heatmaps(jnp.asarray(spike)))
    assert np.unravel_index(sm[0, :, :, 0].argmax(), (33, 33)) == (16, 16)


def _synthetic_pose_maps(kps, h=46, w=46):
    """Build heat/PAF maps for one synthetic person with given keypoints."""
    heat = np.zeros((1, h, w, 19), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for p, (x, y) in enumerate(kps):
        if np.isnan(x):
            continue
        heat[0, :, :, p] = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / 4.0)
    paf = np.zeros((1, h, w, 38), np.float32)
    for l, (a, b) in enumerate(LIMB_SEQ):
        xa, ya = kps[a]
        xb, yb = kps[b]
        if np.isnan(xa) or np.isnan(xb):
            continue
        v = np.array([xb - xa, yb - ya])
        n = np.linalg.norm(v) + 1e-6
        u = v / n
        # paint the PAF in a corridor around the segment
        t = ((xs - xa) * u[0] + (ys - ya) * u[1]) / n
        proj_x, proj_y = xa + t * n * u[0], ya + t * n * u[1]
        d = np.sqrt((xs - proj_x) ** 2 + (ys - proj_y) ** 2)
        m = (t >= 0) & (t <= 1) & (d < 3)
        paf[0, :, :, MAP_IDX[l][0]][m] = u[0]
        paf[0, :, :, MAP_IDX[l][1]][m] = u[1]
    return jnp.asarray(heat), jnp.asarray(paf)


FULL_KPS = np.array(
    [
        [23, 6], [23, 12], [18, 12], [15, 19], [13, 25],  # nose, neck, Rsho, Relb, Rwri
        [28, 12], [31, 19], [33, 25],                      # Lsho, Lelb, Lwri
        [20, 26], [20, 34], [20, 42],                      # Rhip, Rkne, Rank
        [26, 26], [26, 34], [26, 42],                      # Lhip, Lkne, Lank
        [21, 4], [25, 4], [19, 5], [27, 5],                # eyes, ears
    ],
    np.float32,
)


def test_decode_pipeline_recovers_synthetic_person():
    heat, paf = _synthetic_pose_maps(FULL_KPS)
    peaks = find_peaks(heat)
    # every part's best peak is at the planted location
    best = np.asarray(peaks.xy[0, :, 0])
    np.testing.assert_allclose(best, FULL_KPS, atol=1.0)

    scores, ok = score_limb_candidates(paf, peaks)
    people = assemble_people_host(peaks, np.asarray(scores), np.asarray(ok))
    assert people, "no people assembled"
    p = people[0]
    assert p["total_parts"] >= 15
    np.testing.assert_allclose(p["keypoints"], FULL_KPS, atol=1.5)

    chosen = filter_and_pick_largest(people)
    assert chosen is not None

    # missing hips → filtered out
    kps2 = FULL_KPS.copy()
    kps2[8] = np.nan
    kps2[11] = np.nan
    heat2, paf2 = _synthetic_pose_maps(kps2)
    pk2 = find_peaks(heat2)
    s2, ok2 = score_limb_candidates(paf2, pk2)
    ppl2 = assemble_people_host(pk2, np.asarray(s2), np.asarray(ok2))
    assert filter_and_pick_largest(ppl2) is None


def test_render_pose():
    kp01 = FULL_KPS / 46.0
    img = render_pose(jnp.asarray(kp01), (128, 128))
    a = np.asarray(img)
    assert a.shape == (128, 128, 3)
    assert a.max() <= 1.0 and a.min() == 0.0
    assert (a.sum(axis=-1) > 0).mean() > 0.01  # skeleton drawn
    # missing keypoints don't crash and draw less
    kp_nan = kp01.copy()
    kp_nan[4:8] = np.nan
    img2 = np.asarray(render_pose(jnp.asarray(kp_nan), (128, 128)))
    assert (img2.sum(axis=-1) > 0).sum() < (a.sum(axis=-1) > 0).sum()


def test_preprocess_for_openpose():
    out = preprocess_for_openpose(jnp.zeros((1, 512, 512, 3)), target=184)
    assert out.shape == (1, 184, 184, 3)
    assert float(out.min()) == -0.5
