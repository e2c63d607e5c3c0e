"""End-to-end smoke drive of the flagship try-on pipeline on the current
backend (real TPU when available). Asserts output sanity and prints the
measured rate. This is the drive script referenced by the verify skill.

Usage: python scripts/smoke.py [--steps 20] [--batch 1]
       [--controlnet_cache_interval 1] [--unet_cache_interval 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
from edgestyle_tpu.utils.profiling import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--controlnet_cache_interval", type=int, default=1)
    ap.add_argument("--unet_cache_interval", type=int, default=1)
    args = ap.parse_args()

    print(jax.default_backend(), jax.devices(), flush=True)
    pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
    params = pipe.init_params(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )
    g = np.random.default_rng(0)
    B = args.batch
    ids = jnp.asarray(g.integers(1, 49000, (B, 77)), jnp.int32)
    neg = jnp.asarray(g.integers(1, 49000, (B, 77)), jnp.int32)
    imgs = [jnp.asarray(g.standard_normal((B, 512, 512, 3)), jnp.float32) * 0.1
            for _ in range(6)]

    kw = {}
    if args.controlnet_cache_interval > 1:
        kw["controlnet_cache_interval"] = args.controlnet_cache_interval
    if args.unet_cache_interval > 1:
        kw["unet_cache_interval"] = args.unet_cache_interval

    def f():
        return pipe(params, ids, neg, imgs, rng=jax.random.key(1),
                    num_inference_steps=args.steps, guidance_scale=3.5, **kw)

    o = np.asarray(f(), np.float32)
    print(f"out: {o.shape} min/max/std = {o.min():.3f} {o.max():.3f} {o.std():.4f}",
          flush=True)
    assert np.isfinite(o).all(), "non-finite pixels"
    assert 0.0 <= o.min() and o.max() <= 1.0, "out of [0,1]"
    assert o.std() > 1e-3, "degenerate output"
    dt = timeit(f, iters=3)
    print(f"tryon {args.steps} steps B={B}: {B/dt:.4f} img/s ({dt*1e3:.0f} ms)  "
          "SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
