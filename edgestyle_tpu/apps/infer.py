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
    p.add_argument("--random_init", action="store_true")
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
    p.add_argument("--out", type=str, default="result.png")
    return p.parse_args(argv)


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

    pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"))
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

    if args.tokenizer_dir:
        from edgestyle_tpu.data.tokenizer import CLIPTokenizer

        tok = CLIPTokenizer.from_pretrained_dir(args.tokenizer_dir)
        ids = jnp.asarray(tok([args.prompt]))
        neg = jnp.asarray(tok([args.negative_prompt]))
    else:
        from edgestyle_tpu.data.tokenizer import empty_prompt_ids

        ids = jnp.asarray(empty_prompt_ids())
        neg = jnp.asarray(empty_prompt_ids())

    fields = ["agnostic", "original_openpose", "clothes", "clothes_openpose",
              "clothes2", "clothes_openpose2"]
    norm_flags = [True, False, True, False, True, False]  # VAE vs pose branches
    imgs = []
    for f, nrm in zip(fields, norm_flags):
        path = getattr(args, f)
        if path:
            imgs.append(jnp.asarray(_load(path, nrm)))
        else:
            imgs.append(jnp.zeros((1, 512, 512, 3), jnp.float32))

    if args.guidance_sweep:
        import numpy as _np

        scales = _np.linspace(1.0, 7.0, 9)
        tiles = []
        for g in scales:
            out = pipe(
                params, ids, neg, imgs, rng=jax.random.key(args.seed),
                num_inference_steps=args.steps, guidance_scale=float(g),
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
        )
        arr = (np.asarray(out[0]) * 255).astype(np.uint8)
    from PIL import Image

    Image.fromarray(arr).save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
