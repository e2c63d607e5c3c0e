"""Trace ONE full try-on generation (the real jitted program) and aggregate
device time by HLO category + top ops — the honest step breakdown.

Optional --controlnet_cache_interval / --unet_cache_interval trace the
opt-in cached serving programs instead of the exact one."""
import argparse
import os, sys, glob, json, gzip, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--controlnet_cache_interval", type=int, default=1)
ap.add_argument("--unet_cache_interval", type=int, default=1)
ap.add_argument("--cfg_interval", type=float, nargs=2, default=(0.0, 1.0))
ap.add_argument("--tome", type=float, default=0.0)
ap.add_argument("--tome_mlp", action="store_true")
ap.add_argument("--quant", choices=["none", "int8", "int8-static"],
                default="none")
ap.add_argument("--batch", type=int, default=1)
cli = ap.parse_args()
ckw = {}
if cli.controlnet_cache_interval > 1:
    ckw["controlnet_cache_interval"] = cli.controlnet_cache_interval
if cli.unet_cache_interval > 1:
    ckw["unet_cache_interval"] = cli.unet_cache_interval
if tuple(cli.cfg_interval) != (0.0, 1.0):
    ckw["cfg_interval"] = tuple(cli.cfg_interval)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig

tome = None
if cli.tome > 0:
    from edgestyle_tpu.ops.tome import ToMeConfig
    tome = ToMeConfig(ratio=cli.tome, merge_mlp=cli.tome_mlp)
pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto", tome=tome,
                         quant=(cli.quant if cli.quant != "none" else None))
params = pipe.init_params(jax.random.key(0))
params = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params)
rng = np.random.default_rng(0)
b = cli.batch
ids = jnp.asarray(rng.integers(1, 49000, (b, 77)), jnp.int32)
neg = jnp.asarray(rng.integers(1, 49000, (b, 77)), jnp.int32)
imgs = [jnp.asarray(rng.standard_normal((b, 512, 512, 3)), jnp.float32) * 0.1 for _ in range(6)]

def run(seed):
    return pipe(params, ids, neg, imgs, rng=jax.random.key(seed), num_inference_steps=20, guidance_scale=3.5, **ckw)

out = run(0); np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
logdir = "/tmp/edgestyle_trace_pipe"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
out = run(1); np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
jax.profiler.stop_trace()

tr = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tr) as f:
    data = json.load(f)
ev = data['traceEvents']
cat = collections.Counter(); catn = collections.Counter()
name_agg = collections.Counter()
total = 0.0
for e in ev:
    if e.get('ph')=='X' and e['pid']==3 and e.get('tid')==3:
        c = e.get('args',{}).get('hlo_category','?')
        if c in ('while',): continue
        cat[c] += e['dur']; catn[c] += 1
        name_agg[re.sub(r'\.\d+$','',e['name'])] += e['dur']
        total += e['dur']
print(f"total device (excl while wrapper): {total/1e3:.1f} ms")
for c,d in cat.most_common():
    print(f"{d/1e3:9.2f} ms x{catn[c]:<6} {c}")
print("--- top op groups ---")
for n,d in name_agg.most_common(15):
    print(f"{d/1e3:9.2f} ms {n}")
