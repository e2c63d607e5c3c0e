"""Trace the full-size ControlLoRA train step (bench config 5 shape) and
aggregate device time by HLO category — the training-side counterpart of
scripts/trace_pipeline.py."""
import os, sys, glob, json, gzip, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
from edgestyle_tpu.training.train_step import (
    TrainConfig, init_trainable, make_optimizer, make_train_step)

pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"))
params = pipe.init_params(jax.random.key(0))
frozen = {"vae": params["vae"], "clip": params["clip"], "unet": params["unet"],
          "static": params["controlnet"]["static"]}
unet_p = params["unet"]
del params
cfg = TrainConfig(grad_accum=1)
trainable = init_trainable(pipe, jax.random.key(1), unet_p, 32)
state = {"trainable": trainable, "opt_state": make_optimizer(cfg).init(trainable),
         "step": jnp.zeros([], jnp.int32)}
g = np.random.default_rng(0)
img = lambda: jnp.asarray(g.standard_normal((1, 1, 512, 512, 3)), jnp.float32) * 0.2
batch = {"original": img(), "agnostic": img(), "head": img(), "clothes": img(),
         "clothes2": img(), "original_openpose": img(), "clothes_openpose": img(),
         "clothes_openpose2": img(),
         "input_ids": jnp.asarray(g.integers(1, 49000, (1, 1, 77)), jnp.int32)}
n_tr = sum(x.size for x in jax.tree.leaves(trainable))
print(f"trainable params: {n_tr/1e6:.1f}M")
step = jax.jit(make_train_step(pipe, cfg))
ns, m = step(state, frozen, batch, jax.random.key(0)); np.asarray(m["loss"])
logdir = "/tmp/edgestyle_trace_train"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
ns, m = step(state, frozen, batch, jax.random.key(1)); np.asarray(m["loss"])
jax.profiler.stop_trace()

tr = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tr) as f: data = json.load(f)
ev = [e for e in data['traceEvents'] if e.get('ph')=='X' and e['pid']==3 and e.get('tid')==3]
cat = collections.Counter(); name_agg = collections.Counter(); total=0
for e in ev:
    c = e.get('args',{}).get('hlo_category','?')
    if c == 'while': continue
    cat[c]+=e['dur']; name_agg[re.sub(r'\.\d+$','',e['name'])]+=e['dur']; total+=e['dur']
print(f"train step device total: {total/1e3:.1f} ms/sample")
for c,d in cat.most_common(12): print(f"{d/1e3:8.2f} ms  {c}")
print("--- top op groups ---")
for n,d in name_agg.most_common(15): print(f"{d/1e3:8.2f} ms  {n}")

# MFU: XLA cost-model FLOPs of the whole step / device time, vs both the
# v5e bf16 peak (197 TF/s) and this chip's measured matmul roof (130 TF/s,
# BASELINE.md). Reuse the SAME jitted `step` so lower/compile is a true
# cache lookup (a fresh jax.jit(make_train_step(...)) closure would
# re-trace the full-size step for minutes).
cost = step.lower(
    state, frozen, batch, jax.random.key(0)).compile().cost_analysis()
if isinstance(cost, list):
    cost = cost[0]
fl = float(cost.get("flops", -1))
dev_s = total / 1e6
print(f"cost-model flops/step: {fl/1e12:.2f} TF | device {dev_s*1e3:.1f} ms | "
      f"MFU {fl/dev_s/197e12*100:.1f}% of peak, {fl/dev_s/130e12*100:.1f}% of "
      f"measured matmul roof")
