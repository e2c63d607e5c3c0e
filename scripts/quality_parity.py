"""fp32-vs-bf16 end-to-end quality parity on the current backend.

BASELINE.json frames acceptance as "bitwise-close at fp32, perceptual
parity (SSIM >= 0.98) at bf16". The fp32 side of that pair is pinned by
the torch-mirror parity suite (tests/test_fullmodel_parity.py); this
script measures the OTHER half: the same 512px/20-step try-on generation
run once in fp32 and once in bf16 from identical fp32 weights, identical
noise and identical conditioning, compared with SSIM/PSNR. Also reports
the VAE roundtrip pair. Results are recorded in BASELINE.md.

Usage: python scripts/quality_parity.py [--steps 20] [--px 512]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edgestyle_tpu.models.vae import AutoencoderKL, VAEConfig
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
from edgestyle_tpu.utils.metrics import psnr, ssim


def structured_images(g, b, px):
    """Conditioning images with real spatial structure (gradients, discs,
    stripes) so bf16 error can't hide in white noise."""
    yy, xx = np.mgrid[0:px, 0:px] / px
    imgs = []
    for i in range(6):
        base = np.stack(
            [
                np.sin(2 * np.pi * (xx * (i + 1) + yy)),
                ((xx - 0.5) ** 2 + (yy - 0.5) ** 2 < 0.1 + 0.02 * i).astype(float),
                yy,
            ],
            axis=-1,
        )
        base = base + g.standard_normal((px, px, 3)) * 0.05
        imgs.append(jnp.asarray(np.repeat(base[None], b, 0), jnp.float32))
    return imgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--px", type=int, default=512)
    args = ap.parse_args()
    print(jax.default_backend(), jax.devices(), flush=True)

    g = np.random.default_rng(0)
    ids = jnp.asarray(g.integers(1, 49000, (1, 77)), jnp.int32)
    neg = jnp.asarray(g.integers(1, 49000, (1, 77)), jnp.int32)
    imgs = structured_images(g, 1, args.px)

    results = {}

    # ---- VAE roundtrip pair
    img01 = (imgs[0] - imgs[0].min()) / (imgs[0].max() - imgs[0].min())
    vcfg = VAEConfig(sample_size=args.px)
    vae32 = AutoencoderKL(vcfg, dtype=jnp.float32)
    vae16 = AutoencoderKL(vcfg, dtype=jnp.bfloat16)
    vp = jax.jit(vae32.init)(jax.random.key(3), img01 * 2 - 1)["params"]

    def roundtrip(vae):
        return jax.jit(lambda p, x: vae.apply({"params": p}, x))(vp, img01 * 2 - 1)

    r32 = np.asarray(roundtrip(vae32), np.float32)
    r16 = np.asarray(roundtrip(vae16), np.float32)
    a, b = (jnp.asarray(r32) + 1) / 2, (jnp.asarray(r16) + 1) / 2
    results["vae_roundtrip_ssim"] = round(float(jnp.mean(ssim(a, b))), 5)
    results["vae_roundtrip_psnr_db"] = round(float(jnp.mean(psnr(a, b))), 2)
    print("vae:", results, flush=True)

    # ---- full try-on pair (shared fp32 params + noise)
    # Both sides run the SAME program (flash attention on) so the pair
    # isolates exactly the dtype effect. (fp32 with XLA attention OOMs the
    # 16 GB HBM on the 4096² probs buffers; flash keeps them in VMEM. The
    # flash-vs-XLA numeric agreement itself is pinned by tests/test_flash.)
    pipe32 = EdgeStylePipeline(PipelineConfig(dtype="float32"), attn_impl="auto")
    pipe16 = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
    params = pipe32.init_params(jax.random.key(0))  # fp32 master weights

    def run(pipe):
        out = pipe(params, ids, neg, imgs, rng=jax.random.key(7),
                   num_inference_steps=args.steps, guidance_scale=3.5)
        return np.asarray(out, np.float32)

    o16 = run(pipe16)
    print(f"bf16 out std={o16.std():.4f}", flush=True)
    o32 = run(pipe32)
    print(f"fp32 out std={o32.std():.4f}", flush=True)
    results["tryon_ssim_fp32_vs_bf16"] = round(
        float(jnp.mean(ssim(jnp.asarray(o32), jnp.asarray(o16)))), 5
    )
    results["tryon_psnr_db"] = round(
        float(jnp.mean(psnr(jnp.asarray(o32), jnp.asarray(o16)))), 2
    )
    results["tryon_mae"] = round(float(np.abs(o32 - o16).mean()), 5)
    results["steps"] = args.steps
    results["px"] = args.px
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
