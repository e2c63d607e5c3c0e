"""Trace the SAM-L2 mask forward (the extract/preprocess hot path) and
aggregate device time by category/op — sizes the LiteMLA share before
building a Pallas fusion (VERDICT r1 item 9)."""
import os, sys, glob, json, gzip, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from edgestyle_tpu.models.efficientvit.sam import (
    SAM_L2, EfficientViTSam, boxes_to_points, preprocess_sam_image)

sam = EfficientViTSam(SAM_L2, dtype=jnp.bfloat16)
img = preprocess_sam_image(jax.random.uniform(jax.random.key(0), (1, 512, 512, 3)))
pts, lbl = boxes_to_points(jnp.array([[100.0, 150.0, 400.0, 480.0]]))
p = jax.jit(sam.init)(jax.random.key(1), img, pts, lbl)
fwd = jax.jit(lambda p, i, pt, lb: sam.apply(p, i, pt, lb, multimask_output=True))
out = fwd(p, img, pts, lbl); np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
logdir = "/tmp/edgestyle_trace_sam"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
for _ in range(5):
    out = fwd(p, img, pts, lbl)
np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
jax.profiler.stop_trace()

tr = sorted(glob.glob(logdir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(tr) as f: data = json.load(f)
ev = [e for e in data['traceEvents'] if e.get('ph')=='X' and e['pid']==3 and e.get('tid')==3]
cat = collections.Counter(); name_agg = collections.Counter(); total=0
for e in ev:
    c = e.get('args',{}).get('hlo_category','?')
    if c == 'while': continue
    cat[c]+=e['dur']; name_agg[re.sub(r'\.\d+$','',e['name'])]+=e['dur']; total+=e['dur']
print(f"SAM fwd x5 device total: {total/1e3:.2f} ms -> {total/5e3:.3f} ms/fwd")
for c,d in cat.most_common(10): print(f"{d/5e3:8.3f} ms/fwd  {c}")
print("--- top ops ---")
for n,d in name_agg.most_common(12): print(f"{d/5e3:8.3f} ms/fwd  {n}")
