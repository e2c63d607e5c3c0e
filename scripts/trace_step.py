"""Capture a jax.profiler trace of one scan-20 trunk+UNet step and dump the
per-op time table (device-side) so we can see where the non-MXU half of the
step goes. Parses the resulting .xplane.pb with tensorflow's profiler if
available, else just leaves the trace for manual inspection."""
import os, sys, glob, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig

pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
params = pipe.init_params(jax.random.key(0))
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
g = np.random.default_rng(0)
x2 = jnp.asarray(g.standard_normal((2, 64, 64, 4)), jnp.bfloat16)
t2 = jnp.full((2,), 500, jnp.int32)
ctx2 = jnp.asarray(g.standard_normal((2, 77, 768)), jnp.bfloat16)
emb2 = jnp.asarray(g.standard_normal((2, 64, 64, 320)), jnp.bfloat16)
x6, t6, ctx6, emb6 = (jnp.concatenate([a]*3,0) for a in (x2,t2,ctx2,emb2))

def trunk_unet(x6, x2, p, t6, t2, c6, c2, e6):
    d, m = pipe.mcn.branch.apply({"params": p["controlnet"]["static"]}, x6, t6, c6, e6, method="controlnet_forward")
    u = pipe.unet.apply({"params": p["unet"]}, x2, t2, c2)
    return jnp.ravel(m)[:1] + jnp.ravel(u)[:1]

def run(x6, x2, p, t6, t2, c6, c2, e6):
    def step(carry, _):
        out = trunk_unet(x6 + carry*1e-6, x2, p, t6, t2, c6, c2, e6)
        return carry + out.astype(carry.dtype), ()
    final, _ = jax.lax.scan(step, jnp.zeros((1,), jnp.bfloat16), jnp.arange(20))
    return final

jr = jax.jit(run)
out = jr(x6, x2, params, t6, t2, ctx6, ctx2, emb6); np.asarray(out)
logdir = "/tmp/edgestyle_trace_step"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
out = jr(x6, x2, params, t6, t2, ctx6, ctx2, emb6); np.asarray(out)
jax.profiler.stop_trace()
print("trace files:", glob.glob(logdir + "/**/*", recursive=True)[-5:])
