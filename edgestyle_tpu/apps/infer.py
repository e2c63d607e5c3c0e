"""Try-on inference CLI — the TPU equivalent of
/root/reference/test_text2image_pretrained_openpose.py (batch demo with a
guidance sweep) and the generation half of app.py's try_on callback.

Usage (precomputed conditioning images, as in the reference test script):
  python -m edgestyle_tpu.apps.infer \
      --pretrained_model ... --vae ... --openpose_controlnet ... \
      --edgestyle_checkpoint out/edgestyle_trainable.safetensors \
      --agnostic a.png --original_openpose op.png \
      --clothes c1.png --clothes_openpose cop1.png \
      --clothes2 c2.png --clothes_openpose2 cop2.png \
      --prompt "edgestyle, blue, denim, jacket, jeans" \
      --steps 20 --guidance 3.5 --out result.png
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="EdgeStyle-TPU try-on inference")
    # reference flag names (test_text2image_pretrained_openpose.py:…_name_or_path)
    # are accepted as aliases of the short names
    p.add_argument("--pretrained_model", "--pretrained_model_name_or_path",
                   type=str, default=None, dest="pretrained_model")
    p.add_argument("--vae", "--pretrained_vae_name_or_path", type=str,
                   default=None, dest="vae")
    p.add_argument("--openpose_controlnet", "--pretrained_openpose_name_or_path",
                   type=str, default=None, dest="openpose_controlnet")
    p.add_argument("--edgestyle_checkpoint", "--controlnet_model_name_or_path",
                   type=str, default=None, dest="edgestyle_checkpoint",
                   help="trained trainable set: safetensors file or "
                        "reference-layout dir")
    p.add_argument("--tokenizer_dir", type=str, default=None,
                   help="dir with vocab.json + merges.txt")
    p.add_argument("--clip_model", type=str, default=None,
                   help="full CLIPModel dir; with --tokenizer_dir enables "
                        "zero-shot prompt mining from the clothes image "
                        "(reference test script :316 best_embeddings)")
    p.add_argument("--random_init", action="store_true")
    # reference artifact-dir addressing (test_text2image...py:278-314):
    # <path>/{subject,agnostic,head,openpose,clothes}/<image_name>
    p.add_argument("--source_path", type=str, default=None)
    p.add_argument("--source_image_name", type=str, default=None)
    p.add_argument("--target_path", type=str, default=None)
    p.add_argument("--target_image_name", type=str, default=None)
    p.add_argument("--target_path2", type=str, default=None)
    p.add_argument("--target_image_name2", type=str, default=None)
    p.add_argument("--result_path", type=str, default=None)
    p.add_argument("--image_result_name", type=str, default=None)
    p.add_argument("--use_agnostic_images", action=argparse.BooleanOptionalAction,
                   default=False,
                   help="branch 0 reads <source_path>/agnostic instead of "
                        "/head (reference default: head, :292-294)")
    p.add_argument("--prompt_text_to_add", type=str, default="",
                   help="appended to the mined prompt (reference :328)")
    for f in ("agnostic", "original_openpose", "clothes", "clothes_openpose",
              "clothes2", "clothes_openpose2"):
        p.add_argument(f"--{f}", type=str, default=None)
    p.add_argument("--prompt", type=str, default="edgestyle")
    p.add_argument("--negative_prompt", type=str,
                   default="monochrome, lowres, bad anatomy, worst quality, low quality")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--guidance", type=float, default=3.5)
    p.add_argument("--guidance_sweep", action="store_true",
                   help="3x3 grid over guidance 1.0→7.0 like the reference "
                        "test_text2image script (:318-365)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--guess_mode", action="store_true",
                   help="controlnet sees only the conditional batch, with "
                        "a 0.1→1.0 residual ramp (reference "
                        "edgestyle_pipeline.py:453-497)")
    p.add_argument("--control_guidance_start", type=float, default=0.0)
    p.add_argument("--control_guidance_end", type=float, default=1.0)
    p.add_argument("--scheduler", type=str, default="unipc",
                   choices=("unipc", "dpm++"),
                   help="denoise sampler: unipc (reference app.py:118) or "
                        "dpm++ (DPM-Solver++ 2M)")
    p.add_argument("--out", type=str, default="result.png")
    return p.parse_args(argv)


def resolve_artifact_paths(args):
    """Reference artifact-dir addressing → (six slot paths, three source
    paths). Slot order: [agnostic-or-head, source pose, clothes1, pose1,
    clothes2, pose2]; sources: [subject, target, target2]
    (test_text2image_pretrained_openpose.py:278-314)."""
    import os

    art = lambda base, sub, name: os.path.join(base, sub, name)
    first_sub = "agnostic" if args.use_agnostic_images else "head"
    slot_paths = [
        art(args.source_path, first_sub, args.source_image_name),
        art(args.source_path, "openpose", args.source_image_name),
        art(args.target_path, "clothes", args.target_image_name),
        art(args.target_path, "openpose", args.target_image_name),
        art(args.target_path2, "clothes", args.target_image_name2),
        art(args.target_path2, "openpose", args.target_image_name2),
    ]
    source_paths = [
        art(b, "subject", n)
        for b, n in ((args.source_path, args.source_image_name),
                     (args.target_path, args.target_image_name),
                     (args.target_path2, args.target_image_name2))
    ]
    return slot_paths, source_paths


def _load(path, norm):
    from PIL import Image

    from edgestyle_tpu.data.transforms import standard_image, to_float01, to_norm

    with Image.open(path) as im:
        arr = standard_image(np.asarray(im.convert("RGB")))
    return (to_norm(arr) if norm else to_float01(arr))[None]


def main(argv=None):
    args = parse_args(argv)
    from edgestyle_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig

    pipe = EdgeStylePipeline(
        PipelineConfig(dtype="bfloat16", scheduler=args.scheduler)
    )
    if args.random_init:
        params = pipe.init_params(jax.random.key(0))
    else:
        from edgestyle_tpu.core.pretrained import load_pipeline_params

        params = load_pipeline_params(
            args.pretrained_model, args.vae, args.openpose_controlnet,
            edgestyle_checkpoint=args.edgestyle_checkpoint,
        )
    # inference keeps weights bf16 (halves HBM footprint/traffic; matches
    # bench.py so the persistent compile cache is shared)
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16)
        if getattr(p, "dtype", None) == jnp.float32 else p,
        params,
    )

    # conditioning images: artifact-dir addressing (reference
    # test_text2image...py:278-314) or explicit per-slot paths
    import os

    grid_sources = []  # [subject, target, target2] rows of the reference grid
    if args.source_path:
        slot_paths, source_paths = resolve_artifact_paths(args)
        norm_flags = [True, False, True, False, True, False]
        imgs = [jnp.asarray(_load(pth, nrm))
                for pth, nrm in zip(slot_paths, norm_flags)]
        grid_sources = [np.asarray(_load(pth, False)[0]) for pth in source_paths]
    else:
        fields = ["agnostic", "original_openpose", "clothes", "clothes_openpose",
                  "clothes2", "clothes_openpose2"]
        norm_flags = [True, False, True, False, True, False]  # VAE vs pose
        imgs = []
        for f, nrm in zip(fields, norm_flags):
            path = getattr(args, f)
            if path:
                imgs.append(jnp.asarray(_load(path, nrm)))
            else:
                imgs.append(jnp.zeros((1, 512, 512, 3), jnp.float32))

    prompt = args.prompt
    if args.tokenizer_dir:
        from edgestyle_tpu.data.tokenizer import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained_dir(args.tokenizer_dir)
        if args.clip_model:
            # mine the prompt from the clothes cond image like the
            # reference (:316 best_embeddings([clothes]))
            from edgestyle_tpu.data.prompts import build_prompt_miner

            miner = build_prompt_miner(args.tokenizer_dir, args.clip_model)
            clothes01 = np.asarray(imgs[2][0]) / 2.0 + 0.5
            prompt = miner(clothes01[None])[0]
            print(f"mined prompt: {prompt}")
        prompt = " ".join(filter(None, [prompt or "", args.prompt_text_to_add]))
        ids = jnp.asarray(tok([prompt]))
        neg = jnp.asarray(tok([args.negative_prompt]))
    else:
        from edgestyle_tpu.data.tokenizer import empty_prompt_ids

        ids = jnp.asarray(empty_prompt_ids())
        neg = jnp.asarray(empty_prompt_ids())

    if args.guidance_sweep:
        import numpy as _np

        # reference grid: 3 source rows + NUM_IMAGES=6 generations over
        # guidance 1.0→7.0 (:318-361, 3×3 grid at :363); without source
        # images (explicit-path mode) all 9 tiles are generations
        n_gen = 6 if grid_sources else 9
        scales = _np.linspace(1.0, 7.0, n_gen)
        tiles = list(grid_sources)
        for g in scales:
            out = pipe(
                params, ids, neg, imgs, rng=jax.random.key(args.seed),
                num_inference_steps=args.steps, guidance_scale=float(g),
                guess_mode=args.guess_mode,
                control_guidance_start=args.control_guidance_start,
                control_guidance_end=args.control_guidance_end,
            )
            tiles.append(np.asarray(out[0]))
        rows = [np.concatenate(tiles[i * 3 : (i + 1) * 3], axis=1) for i in range(3)]
        arr = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
    else:
        out = pipe(
            params, ids, neg, imgs,
            rng=jax.random.key(args.seed),
            num_inference_steps=args.steps,
            guidance_scale=args.guidance,
            guess_mode=args.guess_mode,
            control_guidance_start=args.control_guidance_start,
            control_guidance_end=args.control_guidance_end,
        )
        arr = (np.asarray(out[0]) * 255).astype(np.uint8)
    from PIL import Image

    out_path = args.out
    if args.result_path:  # reference output addressing (:365)
        os.makedirs(args.result_path, exist_ok=True)
        out_path = os.path.join(
            args.result_path, args.image_result_name or os.path.basename(args.out)
        )
    Image.fromarray(arr).save(out_path)
    print(f"saved {out_path}")


if __name__ == "__main__":
    main()
