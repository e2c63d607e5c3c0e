"""Curation tool tests with stub encoders and synthetic trees."""

import os

import jax.numpy as jnp
import numpy as np
from PIL import Image

from edgestyle_tpu.data.collate import CollateFn
from edgestyle_tpu.data.curation import (
    ClipIQA,
    compare_param_trees,
    find_bad_examples,
    find_missing_artifacts,
    find_similar_subjects,
    inspect_dataset_grid,
    merge_subjects,
    remove_incomplete_frames,
)
from edgestyle_tpu.data.tokenizer import make_tiny_tokenizer
from tests.test_apps import _make_tree
from tests.test_data import _example


def _stub_iqa():
    tok = make_tiny_tokenizer()
    d = 4
    # image encoder: brightness → first coordinate
    enc_img = lambda x: jnp.stack(
        [jnp.mean(x, axis=(1, 2, 3)), jnp.ones(x.shape[0]), jnp.zeros(x.shape[0]),
         jnp.zeros(x.shape[0])], axis=-1)
    calls = {"i": 0}

    def enc_txt(ids):
        n = ids.shape[0]
        # positive prompts → +e0, negative → -e0 (alternating)
        sign = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0)
        return jnp.stack([sign, jnp.ones(n) * 0.1, jnp.zeros(n), jnp.zeros(n)], axis=-1)

    return ClipIQA(tok, enc_img, enc_txt, prompt_pairs=(("good", "bad"),))


def test_clip_iqa_orders_by_quality_proxy():
    iqa = _stub_iqa()
    bright = jnp.ones((1, 4, 4, 3))
    dark = -jnp.ones((1, 4, 4, 3))
    s_b = float(iqa(bright)[0])
    s_d = float(iqa(dark)[0])
    assert s_b > s_d


def test_find_bad_examples(tmp_path):
    iqa = _stub_iqa()
    paths = []
    for i, val in enumerate([0.1, 0.9, 0.5]):
        p = str(tmp_path / f"img{i}.npy")
        np.save(p, np.full((4, 4, 3), val, np.float32))
        paths.append(p)
    worst = find_bad_examples(paths, iqa, load_fn=np.load, worst_k=2)
    assert worst[0][0].endswith("img0.npy")  # darkest = worst under the stub


def test_find_similar_subjects():
    embs = {
        "a": np.array([1.0, 0.0]), "b": np.array([0.99, 0.05]), "c": np.array([0.0, 1.0]),
    }
    out = find_similar_subjects(embs, threshold=0.9)
    assert [(p[0], p[1]) for p in out] == [("a", "b")]


def test_missing_artifacts_and_removal(tmp_path):
    _make_tree(tmp_path, subjects=("s1",), frames=("f0", "f1"))
    os.remove(os.path.join(tmp_path, "s1", "clothes", "f1.jpg"))
    missing = find_missing_artifacts(str(tmp_path))
    assert missing == {("s1", "f1"): ["clothes"]}
    n = remove_incomplete_frames(str(tmp_path))
    assert n == 5  # the 5 remaining artifacts of f1
    assert find_missing_artifacts(str(tmp_path)) == {}


def test_merge_subjects(tmp_path):
    _make_tree(tmp_path, subjects=("s1", "s2"), frames=("f0",))
    merge_subjects(str(tmp_path), "s2", "s1")
    assert os.path.exists(tmp_path / "s1" / "processed" / "s2_f0.jpg")
    assert os.path.exists(tmp_path / "s2" / "_skip_")


def test_compare_param_trees():
    a = {"x": {"w": np.ones(3)}, "y": np.zeros(2)}
    b = {"x": {"w": np.ones(3)}, "y": np.ones(2)}
    rep = compare_param_trees(a, b)
    assert rep == [("y", 1.0)]
    assert compare_param_trees(a, a) == []


def test_inspect_dataset_grid(tmp_path, rng):
    fn = CollateFn(empty_prompt=np.zeros(77, np.int32), uses_vae=True)
    out = inspect_dataset_grid(
        [_example(rng)], fn, np.random.default_rng(0), str(tmp_path / "grid.jpg")
    )
    with Image.open(out) as im:
        assert im.size == (512, 6 * 512)


def test_find_empty_dirs(tmp_path):
    from edgestyle_tpu.data.curation import find_empty_dirs

    os.makedirs(tmp_path / "a" / "b")          # nested, both empty
    os.makedirs(tmp_path / "c")
    (tmp_path / "c" / "x.jpg").write_bytes(b"d")
    os.makedirs(tmp_path / "d" / "e")          # d empty only via e
    empty = find_empty_dirs(str(tmp_path))
    assert set(empty) == {os.path.join("a", "b"), "a",
                          os.path.join("d", "e"), "d"}
    # deepest-first ordering lets callers rmdir in sequence
    for rel in empty:
        os.rmdir(tmp_path / rel)


def test_cli_dispatch(tmp_path, capsys):
    """The `python -m edgestyle_tpu.data.curation` subcommands (reference's
    standalone curation scripts) dispatch over the tested library fns."""
    from edgestyle_tpu.data.curation import main

    root = tmp_path / "data"
    arts = ("processed", "openpose", "subject", "agnostic", "head", "clothes")
    g = np.random.default_rng(0)
    for s in ("s1", "s2"):
        for a in arts:
            d = root / s / a
            os.makedirs(d)
            for f in ("f0", "f1", "f2"):
                Image.fromarray(
                    g.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                ).save(d / (f + ".jpg"))
    os.remove(root / "s2" / "head" / "f1.jpg")  # make one frame incomplete

    main(["missing", str(root)])
    out = capsys.readouterr().out
    assert "s2/f1: missing head" in out and "1 incomplete frames" in out

    main(["clean", str(root)])
    assert "removed 5 files" in capsys.readouterr().out
    assert not (root / "s2" / "subject" / "f1.jpg").exists()

    main(["merge", str(root), "s1", "s2"])
    assert (root / "s2" / "subject" / "s1_f0.jpg").exists()
    assert (root / "s1" / "_skip_").exists()

    os.makedirs(root / "s1" / "empty_sub")
    main(["empty-dirs", str(root), "--remove"])
    assert "empty_sub" in capsys.readouterr().out
    assert not (root / "s1" / "empty_sub").exists()

    from safetensors.numpy import save_file

    save_file({"w": np.zeros(3, np.float32)}, str(tmp_path / "a.safetensors"))
    save_file({"w": np.ones(3, np.float32)}, str(tmp_path / "b.safetensors"))
    main(["compare", str(tmp_path / "a.safetensors"), str(tmp_path / "b.safetensors")])
    out = capsys.readouterr().out
    assert "w: max_abs_diff=1.000e+00" in out and "1 differing tensors" in out

    main(["inspect", str(root), "--out", str(tmp_path / "grid.jpg"), "--n", "2"])
    assert "wrote" in capsys.readouterr().out
    with Image.open(tmp_path / "grid.jpg") as im:
        assert im.size[1] == 6 * 512
