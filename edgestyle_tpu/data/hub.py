"""HF-hub dataset loading (reference /root/reference/dataset.py): the
andrei-ace/EdgeStyle dataset's 10-image + input_ids schema, decoded from
bytes to numpy HWC uint8, with the fixed 4-example test split."""

from __future__ import annotations

import io
from typing import Dict, List

import numpy as np

SCHEMA_FIELDS = (
    "original", "agnostic", "head", "original_openpose", "target", "clothes",
    "clothes_openpose", "target2", "clothes2", "clothes_openpose2",
)
TEST_SPLIT_SIZE = 4  # reference dataset.py:74


def _decode(value) -> np.ndarray:
    from PIL import Image

    if isinstance(value, dict) and "bytes" in value:
        value = value["bytes"]
    if isinstance(value, (bytes, bytearray)):
        with Image.open(io.BytesIO(value)) as im:
            return np.asarray(im.convert("RGB"))
    if hasattr(value, "convert"):  # PIL image
        return np.asarray(value.convert("RGB"))
    return np.asarray(value)


def example_from_row(row: Dict) -> Dict[str, np.ndarray]:
    ex = {f: _decode(row[f]) for f in SCHEMA_FIELDS if f in row}
    if "input_ids" in row:
        ex["input_ids"] = np.asarray(row["input_ids"], np.int32)
    else:
        ex["input_ids"] = np.zeros(77, np.int32)
    return ex


def load_hub_dataset(name_or_path: str, split: str = "train"):
    """Load via `datasets` (local path or hub id when network exists).
    Returns (train_rows, test_rows) with the reference's fixed split."""
    import datasets

    ds = datasets.load_dataset(name_or_path, split=split)
    n = len(ds)
    test = [example_from_row(ds[i]) for i in range(min(TEST_SPLIT_SIZE, n))]
    train_idx = list(range(min(TEST_SPLIT_SIZE, n), n))
    return _LazyRows(ds, train_idx), test


class _LazyRows:
    def __init__(self, ds, indices: List[int]):
        self.ds = ds
        self.indices = indices

    def __len__(self):
        return len(self.indices)

    def example(self, i: int) -> Dict[str, np.ndarray]:
        return example_from_row(self.ds[self.indices[i]])
