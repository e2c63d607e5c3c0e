"""Per-component wall-clock breakdown of the full-size try-on step on the
real TPU.

Technique: the axon tunnel adds ~tens of ms of dispatch overhead per call,
so naive per-call timing of small sub-programs mis-attributes. Instead each
component is wrapped in a 20-iteration `lax.scan` INSIDE one jitted program
(mirroring the pipeline's denoise scan) and we report (t_scan20 / 20).
Params are passed as arguments, never closed over (closures bake weights
into the HLO as constants and blow the tunnel's remote-compile size limit).

Usage: python scripts/profile_breakdown.py  (from the repo root)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
from edgestyle_tpu.utils.profiling import scan_probe, timeit

STEPS = 20

scan20 = scan_probe


def main():
    pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
    t0 = time.time()
    params = pipe.init_params(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )
    print(f"init {time.time()-t0:.1f}s", flush=True)

    g = np.random.default_rng(0)
    B = 1
    x2 = jnp.asarray(g.standard_normal((2 * B, 64, 64, 4)), jnp.bfloat16)
    t2 = jnp.full((2 * B,), 500, jnp.int32)
    ctx = jnp.asarray(g.standard_normal((2 * B, 77, 768)), jnp.bfloat16)
    embs2 = [jnp.asarray(g.standard_normal((2 * B, 64, 64, 320)), jnp.bfloat16)
             for _ in range(6)]
    scales = jnp.ones((6,), jnp.float32)

    results = {}

    def report(name, seconds):
        results[name] = seconds * 1e3 / STEPS
        print(f"{name}: {results[name]:.2f} ms/step", flush=True)

    # --- one ControlNet trunk forward at each group batch size
    def trunk(x, p, t, c, e):
        d, m = pipe.mcn.branch.apply({"params": p}, x, t, c, e,
                                     method="controlnet_forward")
        return m

    for name, reps in [("trunk_b2", 1), ("trunk_b4", 2), ("trunk_b6", 3)]:
        xx = jnp.concatenate([x2] * reps, 0)
        tt = jnp.concatenate([t2] * reps, 0)
        cc = jnp.concatenate([ctx] * reps, 0)
        ee = jnp.concatenate([embs2[0]] * reps, 0)
        f = scan20(trunk)  # the carry IS the trunk input → body can't hoist
        report(name, timeit(f, xx, params["controlnet"]["static"], tt, cc, ee, iters=3))

    # --- full multicontrolnet (3 grouped trunks + fusion)
    def mcn(x, p):
        d, m = pipe.mcn(p, x, t2, ctx, embs2, scales)
        return m

    report("mcn_total", timeit(scan20(mcn), x2, params["controlnet"], iters=3))

    # --- UNet alone (no residuals)
    def unet(x, p):
        return pipe.unet.apply({"params": p}, x, t2, ctx)

    report("unet_alone", timeit(scan20(unet), x2, params["unet"], iters=3))

    # --- full step: mcn + unet with residuals
    def full_step_p(x, p):
        down, mid = pipe.mcn(p["controlnet"], x, t2, ctx, embs2, scales)
        return pipe.unet.apply({"params": p["unet"]}, x, t2, ctx,
                               down_block_additional_residuals=down,
                               mid_block_additional_residual=mid)

    report("mcn_plus_unet", timeit(scan20(full_step_p), x2, params, iters=3))

    # --- the pipeline itself (includes scheduler, CFG combine, clip, vae)
    ids = jnp.asarray(g.integers(1, 49000, (B, 77)), jnp.int32)
    neg = jnp.asarray(g.integers(1, 49000, (B, 77)), jnp.int32)
    imgs = [jnp.asarray(g.standard_normal((B, 512, 512, 3)), jnp.float32) * 0.1
            for _ in range(6)]
    full = lambda: pipe(params, ids, neg, imgs, rng=jax.random.key(1),
                        num_inference_steps=STEPS, guidance_scale=3.5)
    report("pipeline_total", timeit(full, iters=3))
    results["scheduler_vae_clip_overhead_ms_per_step"] = (
        results["pipeline_total"] - results["mcn_plus_unet"])
    print(json.dumps({k: round(v, 2) for k, v in results.items()}, indent=1),
          flush=True)


if __name__ == "__main__":
    main()
