import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
params = pipe.init_params(jax.random.key(0))
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
g = np.random.default_rng(0)
for B in (4,):
    ids = jnp.asarray(g.integers(1, 49000, (B, 77)), jnp.int32)
    neg = jnp.asarray(g.integers(1, 49000, (B, 77)), jnp.int32)
    imgs = [jnp.asarray(g.standard_normal((B, 512, 512, 3)), jnp.float32) * 0.1 for _ in range(6)]
    run = lambda s: pipe(params, ids, neg, imgs, rng=jax.random.key(s), num_inference_steps=20, guidance_scale=3.5)
    out = run(0); _ = np.asarray(out[0,0,0])
    t0=time.time()
    for i in range(3): out = run(i+1)
    _ = np.asarray(out[0,0,0])
    dt=(time.time()-t0)/3
    print("B=%d: %.2f s/batch -> %.3f img/s" % (B, dt, B/dt))
