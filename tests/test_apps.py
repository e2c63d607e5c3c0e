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


def test_reference_flag_name_aliases():
    """The reference's --*_name_or_path flag names (train/test/inference
    scripts) are accepted as aliases across all entry points."""
    from edgestyle_tpu.apps.infer import parse_args as infer_args
    from edgestyle_tpu.apps.tryon import parse_args as tryon_args

    a = parse_args([
        "--random_init",
        "--pretrained_model_name_or_path", "/m",
        "--pretrained_vae_name_or_path", "/v",
        "--pretrained_openpose_name_or_path", "/o",
    ])
    assert (a.pretrained_model, a.vae, a.openpose_controlnet) == ("/m", "/v", "/o")

    a = infer_args([
        "--random_init",
        "--pretrained_model_name_or_path", "/m",
        "--controlnet_model_name_or_path", "/c",
    ])
    assert (a.pretrained_model, a.edgestyle_checkpoint) == ("/m", "/c")

    a = tryon_args([
        "--subject", "s.jpg", "--clothes1", "c1.jpg", "--clothes2", "c2.jpg",
        "--random_init", "--controlnet_model_name_or_path", "/c",
        "--prompt_text_to_add", ", studio light",
    ])
    assert a.edgestyle_checkpoint == "/c"
    assert a.prompt_text_to_add == ", studio light"


def test_infer_artifact_dir_addressing():
    """--source_path/--target_path dir addressing mirrors the reference
    test script's layout (test_text2image...py:278-314): branch 0 reads
    head/ by default, agnostic/ only under --use_agnostic_images."""
    from edgestyle_tpu.apps.infer import parse_args as infer_args
    from edgestyle_tpu.apps.infer import resolve_artifact_paths

    base = [
        "--random_init",
        "--source_path", "/d/src", "--source_image_name", "a.jpg",
        "--target_path", "/d/t1", "--target_image_name", "b.jpg",
        "--target_path2", "/d/t2", "--target_image_name2", "c.jpg",
    ]
    slots, sources = resolve_artifact_paths(infer_args(base))
    assert slots == [
        "/d/src/head/a.jpg", "/d/src/openpose/a.jpg",
        "/d/t1/clothes/b.jpg", "/d/t1/openpose/b.jpg",
        "/d/t2/clothes/c.jpg", "/d/t2/openpose/c.jpg",
    ]
    assert sources == ["/d/src/subject/a.jpg", "/d/t1/subject/b.jpg",
                       "/d/t2/subject/c.jpg"]
    slots, _ = resolve_artifact_paths(infer_args(base + ["--use_agnostic_images"]))
    assert slots[0] == "/d/src/agnostic/a.jpg"


def test_reference_readme_recipe_parses():
    """The exact flag set from the reference README training recipe
    (README.md:66-96, minus the accelerate launcher) parses unchanged."""
    a = parse_args([
        "--pretrained_model_name_or_path=SG161222/Realistic_Vision_V5.1_noVAE",
        "--pretrained_vae_name_or_path=stabilityai/sd-vae-ft-mse",
        "--pretrained_openpose_name_or_path=lllyasviel/control_v11p_sd15_openpose",
        "--output_dir=models/output_text2image_pretrained_openpose",
        "--resolution=512",
        "--train_batch_size=2",
        "--gradient_accumulation_steps", "32",
        "--mixed_precision", "fp16",
        "--controllora_use_vae",
        "--seed=42",
        "--resume_from_checkpoint", "latest",
        "--num_validation_images", "4",
        "--checkpoints_total_limit", "3",
        "--dataloader_num_workers", "2",
        "--snr_gamma=5.0",
        "--optimizer=prodigy",
        "--learning_rate=1.0",
        "--prodigy_safeguard_warmup=True",
        "--prodigy_use_bias_correction=True",
        "--adam_beta1=0.9",
        "--adam_beta2=0.99",
        "--adam_weight_decay=0.01",
        "--proportion_empty_prompts=0.1",
        "--proportion_empty_images=0.1",
        "--proportion_cutout_images=0.1",
        "--proportion_patchworked_images=0.1",
        "--proportion_patchworks=0.1",
        "--validation_steps", "100",
        "--checkpointing_steps", "100",
        "--max_train_steps=20000",
    ])
    assert a.pretrained_model == "SG161222/Realistic_Vision_V5.1_noVAE"
    assert a.train_batch_size == 2 and a.gradient_accumulation_steps == 32
    assert a.optimizer == "prodigy" and a.learning_rate == 1.0
    assert a.snr_gamma == 5.0 and a.controllora_use_vae
    assert a.prodigy_safeguard_warmup is True
    assert a.mixed_precision == "fp16" and a.max_train_steps == 20000
    assert a.use_agnostic_images is False  # recipe never sets it → head crops


def test_serving_mode_presets():
    """--mode presets fold into the knob flags; explicit flags win; the
    preset table matches the README cheat sheet semantics."""
    from edgestyle_tpu.apps.tryon import (
        SERVING_MODES, apply_serving_mode, parse_args as tryon_args)

    base = ["--subject", "s.jpg", "--clothes1", "a.jpg", "--clothes2", "b.jpg"]
    # aggressive tier (VERDICT r4 item 2): front-loaded ControlNet refresh
    # schedule, the fastest lever meeting steered SSIM >= 0.94 (0.9660 @
    # 1.55x; every faster composite measured under the bar — see
    # SERVING_MODES comments / steered_quality_r5.jsonl)
    a = apply_serving_mode(tryon_args(base + ["--mode", "aggressive"]))
    assert tuple(a.cfg_interval) == (0.0, 1.0)
    assert tuple(a.controlnet_cache_steps) == (0, 1, 2, 4, 7, 11, 16)
    assert a.controlnet_cache_interval == 1  # schedule carries the cache
    assert a.unet_cache_interval == 1 and a.tome == 0.0

    # an explicit interval beats the preset's SCHEDULE (they are mutually
    # exclusive in the pipeline)
    a = apply_serving_mode(tryon_args(
        base + ["--mode", "aggressive", "--controlnet_cache_interval", "2"]))
    assert a.controlnet_cache_interval == 2
    assert a.controlnet_cache_steps is None

    # a lower explicit --steps clamps the preset schedule into range
    a = apply_serving_mode(tryon_args(
        base + ["--mode", "aggressive", "--steps", "10"]))
    assert tuple(a.controlnet_cache_steps) == (0, 1, 2, 4, 7)

    # quality tier: ControlNet cache k=2 (steered SSIM 0.982)
    a = apply_serving_mode(tryon_args(base + ["--mode", "quality"]))
    assert a.controlnet_cache_interval == 2
    assert tuple(a.cfg_interval) == (0.0, 1.0) and a.tome == 0.0

    # conservative: the gentlest single lever (ToMe, steered SSIM 0.986)
    a = apply_serving_mode(tryon_args(base + ["--mode", "conservative"]))
    assert a.tome == 0.5 and a.controlnet_cache_interval == 1
    assert tuple(a.cfg_interval) == (0.0, 1.0)

    a = apply_serving_mode(tryon_args(base + ["--mode", "turbo"]))
    assert a.unet_cache_interval == 2 and a.tome == 0.5

    # lcm preset: few-step consistency serving (scheduler + cfg off + 4
    # steps); explicit --steps still wins
    a = apply_serving_mode(tryon_args(base + ["--mode", "lcm"]))
    assert a.scheduler == "lcm" and tuple(a.cfg_interval) == (0.0, 0.0)
    assert a.steps == 4
    a = apply_serving_mode(tryon_args(base + ["--mode", "lcm", "--steps", "8"]))
    assert a.steps == 8 and a.scheduler == "lcm"

    # exact = all knobs at reference semantics
    a = apply_serving_mode(tryon_args(base))
    assert a.controlnet_cache_interval == 1 and a.unet_cache_interval == 1
    assert tuple(a.cfg_interval) == (0.0, 1.0) and a.tome == 0.0
    assert set(SERVING_MODES) == {
        "exact", "conservative", "quality", "aggressive", "turbo", "lcm"
    }

    # serve.py exposes the same flag
    from edgestyle_tpu.apps.serve import parse_args as serve_args

    s = apply_serving_mode(serve_args(["--port", "0", "--mode", "quality"]))
    assert s.controlnet_cache_interval == 2
    # idempotent (TryOnSystem applies it again)
    s2 = apply_serving_mode(s)
    assert s2.controlnet_cache_interval == 2


def test_data_loader_workers_identical_batches(tmp_path):
    """Thread-pooled example loading + background prefetch must be
    byte-identical to the synchronous loader (order-preserving map, same
    collate rng stream)."""
    from edgestyle_tpu.data.prefetch import prefetch

    _make_tree(tmp_path, subjects=("s1",))
    ds = EdgeStyleLocalDataset(str(tmp_path))
    sync_it = data_loader(ds, batch_size=2, grad_accum=1, seed=3)
    par_it = prefetch(
        data_loader(ds, batch_size=2, grad_accum=1, seed=3, num_workers=2),
        depth=2,
    )
    try:
        for _ in range(3):
            a, b = next(sync_it), next(par_it)
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    finally:
        par_it.close()
    assert not par_it._thread.is_alive()


def test_prefetch_iterator_semantics():
    """Order, exhaustion, error propagation, close() mid-stream."""
    from edgestyle_tpu.data.prefetch import PrefetchIterator, parallel_map

    # order + StopIteration
    assert list(PrefetchIterator(iter(range(7)), depth=2)) == list(range(7))

    # source exceptions surface at the consumer
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(bad(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        next(it)

    # close() mid-stream on an infinite source stops the producer
    import itertools

    inf = PrefetchIterator(itertools.count(), depth=2)
    assert next(inf) >= 0
    inf.close()
    assert not inf._thread.is_alive()
    with pytest.raises(StopIteration):
        next(inf)

    # parallel_map preserves order and degrades gracefully
    assert parallel_map(lambda x: x * x, [3, 1, 2], workers=2) == [9, 1, 4]
    assert parallel_map(lambda x: x * x, [3], workers=4) == [9]
    assert parallel_map(lambda x: x + 1, [1, 2], workers=0) == [2, 3]

    with pytest.raises(ValueError, match="depth"):
        PrefetchIterator(iter([]), depth=0)
