"""int8-vs-bf16 end-to-end quality + throughput on the current backend.

Companion to quality_parity.py (fp32-vs-bf16): same structured
conditioning, same shared weights and noise, but the pair here isolates
the opt-in W8A8 serving quantization (ops/quant.py, EDGESTYLE_QUANT=int8).
Reports SSIM/PSNR/MAE plus wall-clock img/s for BOTH pipes measured
back-to-back in one session (the only apples-to-apples timing the axon
tunnel allows — absolute numbers drift run to run, the ratio is stable).
Results are recorded in BASELINE.md.

Usage: python scripts/quality_int8.py [--steps 20] [--px 512]
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

from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
from edgestyle_tpu.utils.metrics import psnr, ssim
from edgestyle_tpu.utils.profiling import timeit
from quality_parity import structured_images


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--px", type=int, default=512)
    ap.add_argument("--batch", type=int, nargs="+", default=[1])
    ap.add_argument("--mode", choices=["int8", "int8-static"], default="int8")
    args = ap.parse_args()
    print(jax.default_backend(), jax.devices(), flush=True)

    params = None
    for b in args.batch:  # one process → one tunnel init, N measurements
        g = np.random.default_rng(0)
        ids = jnp.asarray(g.integers(1, 49000, (b, 77)), jnp.int32)
        neg = jnp.asarray(g.integers(1, 49000, (b, 77)), jnp.int32)
        imgs = structured_images(g, b, args.px)

        pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
        qpipe = EdgeStylePipeline(
            PipelineConfig(dtype="bfloat16"), attn_impl="auto", quant=args.mode
        )
        if params is None:
            params = pipe.init_params(jax.random.key(0))
            params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
                params,
            )

        def run(p):
            return p(params, ids, neg, imgs, rng=jax.random.key(7),
                     num_inference_steps=args.steps, guidance_scale=3.5)

        o8 = np.asarray(run(qpipe), np.float32)
        print(f"B={b} {args.mode} out std={o8.std():.4f}", flush=True)
        o16 = np.asarray(run(pipe), np.float32)
        print(f"B={b} bf16 out std={o16.std():.4f}", flush=True)

        results = {
            "tryon_ssim_bf16_vs_quant": round(
                float(jnp.mean(ssim(jnp.asarray(o16), jnp.asarray(o8)))), 5
            ),
            "tryon_psnr_db": round(
                float(jnp.mean(psnr(jnp.asarray(o16), jnp.asarray(o8)))), 2
            ),
            "tryon_mae": round(float(np.abs(o16 - o8).mean()), 5),
            "steps": args.steps,
            "px": args.px,
            "batch": b,
            "mode": args.mode,
        }
        t16 = timeit(run, pipe, iters=3)
        t8 = timeit(run, qpipe, iters=3)
        results["bf16_img_s"] = round(b / t16, 4)
        results["int8_img_s"] = round(b / t8, 4)
        results["int8_speedup"] = round(t16 / t8, 3)
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
