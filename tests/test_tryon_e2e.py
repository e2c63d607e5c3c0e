"""End-to-end TryOnSystem smoke on tiny configs (CPU): photos → pose →
masks → generation, all through the app-level class."""

import numpy as np
import pytest

import edgestyle_tpu.apps.tryon as tryon_mod
from edgestyle_tpu.apps.tryon import TryOnSystem, load_image_512


@pytest.fixture()
def tiny_system(monkeypatch):
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.models.efficientvit.sam import SamConfig
    from edgestyle_tpu.models.openpose import BodyPoseNet
    from edgestyle_tpu.pipelines.preprocess import TryOnPreprocessor
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline
    from tests.test_efficientvit import TINY_BB
    from tests.test_pipeline import TINY_PIPE

    sys_ = TryOnSystem.__new__(TryOnSystem)
    sys_.jax, sys_.jnp = jax, jnp
    k = jax.random.split(jax.random.key(0), 3)
    sys_.pose_net = BodyPoseNet()
    x = jnp.zeros((1, 64, 64, 3))
    sys_.pose_params = sys_.pose_net.init(k[0], x)["params"]
    sys_.preproc = TryOnPreprocessor(SamConfig(backbone=TINY_BB, neck_depth=1, image_size=32))
    sys_.sam_params = sys_.preproc.init_params(k[1])
    sys_.pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    sys_.gen_params = sys_.pipe.init_params(k[2])
    # __new__ skips __init__ — install the serving-knob defaults the same
    # way __init__ does (this is why _set_serving_knobs is factored out)
    sys_._set_serving_knobs(None)
    return sys_


def test_tryon_system_end_to_end(tiny_system, rng):
    import jax.numpy as jnp

    sys_ = tiny_system
    img32 = rng.random((32, 32, 3)).astype(np.float32)

    # pose path at the pose net's own resolution
    kp, skel = sys_.detect_pose(rng.random((512, 512, 3)).astype(np.float32))
    assert skel.shape == (512, 512, 3)  # may be empty if no person found

    ex = sys_.extract(img32, None)
    assert ex["agnostic"].shape == (32, 32, 3)

    cond = {
        "agnostic": ex["agnostic"], "subject_pose": img32,
        "clothes1": ex["clothes"], "clothes1_pose": img32,
        "clothes2": ex["clothes"], "clothes2_pose": img32,
    }
    ids = jnp.zeros((1, 7), jnp.int32)
    out = sys_.generate(cond, ids, ids, steps=2)
    assert out.shape == (32, 32, 3)
    assert np.isfinite(out).all()


def test_prepare_cond_batch_matches_sequential(tiny_system, rng):
    """The serve batcher's grouped preprocessing (ONE pose program + ONE
    vmapped SAM program for the group's 3B photos) must reproduce the
    single-request prepare_cond outputs per request."""
    sys_ = tiny_system
    # the tiny SAM config works at 32px; prepare_cond feeds the SAME image
    # to pose + SAM, so build 32px triples (pose still runs — at its own
    # internal resize — and typically finds no person in noise, which is
    # exactly the None-keypoints path the batcher must also reproduce)
    triples = [
        [rng.random((32, 32, 3)).astype(np.float32) for _ in range(3)]
        for _ in range(2)
    ]
    seq = [sys_.prepare_cond(s, c1, c2) for s, c1, c2 in triples]
    got = sys_.prepare_cond_batch(
        [t[0] for t in triples], [t[1] for t in triples],
        [t[2] for t in triples],
    )
    assert len(got) == len(seq)
    for a, b in zip(got, seq):
        assert sorted(a) == sorted(b)
        for k in b:
            np.testing.assert_allclose(
                a[k], b[k], atol=2e-5,
                err_msg=f"cond {k!r} differs batched vs sequential",
            )


def test_detect_pose_batch_matches_single(tiny_system, rng):
    sys_ = tiny_system
    imgs = rng.random((2, 512, 512, 3)).astype(np.float32)
    kps_b, skels_b = sys_.detect_pose_batch(imgs)
    for i in range(2):
        kp, skel = sys_.detect_pose(imgs[i])
        if kp is None:
            assert kps_b[i] is None
        else:
            np.testing.assert_allclose(kps_b[i], kp, atol=1e-5)
        np.testing.assert_allclose(skels_b[i], skel, atol=1e-5)


def test_load_image_512_pads_nonsquare(tmp_path, rng):
    from PIL import Image

    p = str(tmp_path / "x.jpg")
    Image.fromarray(rng.integers(0, 255, (300, 600, 3), dtype=np.uint8)).save(p)
    out = load_image_512(p)
    assert out.shape == (512, 512, 3)
    # white padding bands top/bottom
    assert (out[:5] > 200).mean() > 0.9
