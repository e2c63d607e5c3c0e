"""Segmenter finetuning: DiceCE math, label subsets, box jitter, and the
decoder-only train step on a tiny SAM (loss decreases, encoder untouched)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.models.efficientvit.sam import EfficientViTSam, SamConfig
from edgestyle_tpu.training.segmenter import (
    KEEP_CATEGORIES,
    SegmenterTrainConfig,
    binary_target,
    dice_ce_loss,
    init_segmenter_state,
    jittered_box,
    make_segmenter_train_step,
)
from tests.test_efficientvit import TINY_BB


def test_binary_target_subsets():
    labels = jnp.asarray(np.arange(18).reshape(1, 3, 6))
    head = np.asarray(binary_target(labels, "head"))
    expect = np.isin(np.arange(18).reshape(1, 3, 6), KEEP_CATEGORIES["head"])
    np.testing.assert_array_equal(head, expect)
    # subject keeps everything but background
    subj = np.asarray(binary_target(labels, "subject"))
    assert not subj[0, 0, 0] and subj.sum() == 17


def test_dice_ce_loss_properties(rng):
    t = jnp.asarray(rng.random((2, 16, 16)) > 0.5)
    perfect = jnp.where(t, 20.0, -20.0)
    wrong = -perfect
    l_good = float(dice_ce_loss(perfect, t))
    l_bad = float(dice_ce_loss(wrong, t))
    assert l_good < 0.01
    assert l_bad > 1.0


def test_jittered_box_bounds(rng):
    m = jnp.zeros((64, 64), bool).at[20:40, 10:30].set(True)
    pts, lbl = jittered_box(m, jax.random.key(0), jitter=30, prompt_scale=2.0)
    assert pts.shape == (2, 2) and lbl.tolist() == [2, 3]
    p = np.asarray(pts) / 2.0
    assert (p >= 0).all() and (p <= 64).all()


@pytest.mark.heavy
def test_segmenter_train_step_learns():
    cfg = SamConfig(backbone=TINY_BB, neck_depth=1, image_size=64)
    sam = EfficientViTSam(cfg)
    img = jnp.zeros((1, 64, 64, 3))
    pts = jnp.zeros((1, 2, 2))
    lbl = jnp.array([[2, 3]])
    frozen = sam.init(jax.random.key(0), img, pts, lbl)["params"]

    tcfg = SegmenterTrainConfig(head="clothes", box_jitter=5)
    state = init_segmenter_state(frozen, tcfg)
    step = jax.jit(make_segmenter_train_step(sam, tcfg))

    g = np.random.default_rng(0)
    labels = np.zeros((2, 64, 64), np.int32)
    labels[:, 20:50, 16:48] = 4  # "clothes" category
    batch = {
        "image": jnp.asarray(g.standard_normal((2, 64, 64, 3)), jnp.float32) * 0.1,
        "labels": jnp.asarray(labels),
    }
    losses = []
    for i in range(25):
        state, m = step(state, frozen, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[-5:]) < losses[0], losses[:3] + losses[-3:]
    # frozen params untouched (by construction) and decoder changed
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state["decoder"])[0]),
        np.asarray(jax.tree.leaves(frozen["mask_decoder"])[0]),
    )
