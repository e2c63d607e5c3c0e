"""App-layer tests: dataset indexing/loading from a synthetic artifact tree,
trainer arg parsing + validation, loader batch schema."""

import os

import numpy as np
import pytest
from PIL import Image

from edgestyle_tpu.apps.train import parse_args
from edgestyle_tpu.data.dataset import EdgeStyleLocalDataset, data_loader, filter_pairs

ARTS = ("processed", "openpose", "subject", "agnostic", "head", "clothes")


def _make_tree(root, subjects=("s1", "s2"), frames=("f0", "f1", "f2")):
    g = np.random.default_rng(0)
    for s in subjects:
        for a in ARTS:
            d = os.path.join(root, s, a)
            os.makedirs(d, exist_ok=True)
            for f in frames:
                img = g.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                Image.fromarray(img).save(os.path.join(d, f + ".jpg"))


def test_dataset_index_permutations(tmp_path):
    _make_tree(tmp_path)
    ds = EdgeStyleLocalDataset(str(tmp_path))
    # 2 subjects × P(3,3)=6 permutations
    assert len(ds) == 12
    ex = ds.example(0)
    assert set(ex) >= {
        "original", "agnostic", "head", "original_openpose", "target", "clothes",
        "clothes_openpose", "target2", "clothes2", "clothes_openpose2", "input_ids",
    }
    assert ex["original"].shape == (64, 64, 3)


def test_dataset_skip_marker(tmp_path):
    _make_tree(tmp_path, subjects=("keep", "drop"))
    open(os.path.join(tmp_path, "drop", "_skip_"), "w").close()
    ds = EdgeStyleLocalDataset(str(tmp_path))
    assert {i[0] for i in ds.index} == {"keep"}


def test_filter_pairs(tmp_path):
    _make_tree(tmp_path, subjects=("s1",))
    ds = EdgeStyleLocalDataset(str(tmp_path))
    n0 = len(ds)
    filter_pairs(ds, lambda a, b: 0.85)  # all pass
    assert len(ds) == n0
    filter_pairs(ds, lambda a, b: 0.5)  # all fail
    assert len(ds) == 0


def test_data_loader_batch_schema(tmp_path):
    _make_tree(tmp_path, subjects=("s1",))
    ds = EdgeStyleLocalDataset(str(tmp_path))
    it = data_loader(ds, batch_size=4, grad_accum=2, seed=1)
    batch = next(it)
    assert batch["original"].shape == (2, 2, 512, 512, 3)
    assert batch["input_ids"].shape == (2, 2, 77)
    assert batch["original"].dtype == np.float32


def test_parse_args_validates_resolution():
    args = parse_args(["--random_init", "--max_train_steps", "5"])
    assert args.train_batch_size == 2 and args.gradient_accumulation_steps == 32
    with pytest.raises(SystemExit):
        parse_args(["--resolution", "500"])
