"""MFU + fusion-headroom profile for the hot compute path (VERDICT r1
item 3 pre-work: before building a fused GroupNorm+SiLU+conv kernel,
measure how much of the step the non-matmul chain actually costs and what
XLA's conv efficiency is at the hot shapes).

Measures, scan-20-style (see profile_breakdown.py for why):
  1. trunk/UNet wall time + exact HLO FLOPs → true MFU vs the 130 TFLOP/s
     measured bf16 matmul roof;
  2. the ResnetBlock GN→SiLU→conv chain vs its conv-only core at the four
     UNet resolutions → the elementwise/norm overhead a fused kernel could
     recover;
  3. XLA conv-vs-equivalent-matmul efficiency at the same FLOP count;
  4. batch scaling of the trunk (B=6 vs B=24) to localize the reported
     B=4 throughput anomaly.

Usage: python scripts/profile_mfu.py [--quick]
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

import flax.linen as nn

from edgestyle_tpu.models.layers import ResnetBlock2D
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
from edgestyle_tpu.utils.profiling import (
    compiled_flops, ms_per_scan_step, scan_probe)

ROOF_TFLOPS = 130.0  # measured 8192^3 bf16 matmul on this chip (BASELINE.md)
STEPS = 20

scan20 = scan_probe
ms_per_step = ms_per_scan_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    print(jax.default_backend(), jax.devices(), flush=True)

    results = {}
    g = np.random.default_rng(0)
    dt = jnp.bfloat16

    # ---------------- 1. trunk + UNet MFU
    pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
    params = pipe.init_params(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p.astype(dt) if p.dtype == jnp.float32 else p, params
    )
    x2 = jnp.asarray(g.standard_normal((2, 64, 64, 4)), dt)
    t2 = jnp.full((2,), 500, jnp.int32)
    ctx2 = jnp.asarray(g.standard_normal((2, 77, 768)), dt)
    emb2 = jnp.asarray(g.standard_normal((2, 64, 64, 320)), dt)

    def trunk(x, p, t, c, e):
        d, m = pipe.mcn.branch.apply({"params": p}, x, t, c, e,
                                     method="controlnet_forward")
        return m

    def unet(x, p, t, c):
        return pipe.unet.apply({"params": p}, x, t, c)

    for name, fn, mkargs in [
        ("trunk_b6", trunk, lambda r: (
            jnp.concatenate([x2] * r, 0), params["controlnet"]["static"],
            jnp.concatenate([t2] * r, 0), jnp.concatenate([ctx2] * r, 0),
            jnp.concatenate([emb2] * r, 0))),
        ("unet_b2", unet, lambda r: (
            x2, params["unet"], t2, ctx2)),
    ]:
        a = mkargs(3)
        fl = compiled_flops(lambda *aa: fn(*aa), *a)
        ms = ms_per_step(scan20(fn), *a)
        tflops = fl["flops"] / 1e12
        mfu = tflops / (ms / 1e3) / ROOF_TFLOPS
        results[name] = {"ms": round(ms, 2), "gflops": round(tflops * 1e3, 1),
                         "mfu_vs_roof": round(mfu, 3)}
        print(name, results[name], flush=True)

    # --------------- 2. resnet chain vs conv-only at UNet shapes
    # (B=6: the dominant openpose-trunk group batch)
    chain_shapes = [(6, 64, 64, 320), (6, 32, 32, 640), (6, 16, 16, 1280),
                    (6, 8, 8, 1280)]
    temb = jnp.asarray(g.standard_normal((6, 1280)), dt)
    for (b, h, w, c) in chain_shapes:
        x = jnp.asarray(g.standard_normal((b, h, w, c)), dt)
        block = ResnetBlock2D(c, dtype=dt)
        bp = jax.jit(block.init)(jax.random.key(1), x, temb)["params"]

        def res_chain(xx, p, tt):
            return block.apply({"params": p}, xx, tt)

        conv = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), dtype=dt)
        cp = jax.jit(conv.init)(jax.random.key(2), x)["params"]

        def conv2(xx, p):
            return conv.apply({"params": p}, conv.apply({"params": p}, xx))

        ms_chain = ms_per_step(scan20(res_chain), x, bp, temb)
        ms_conv = ms_per_step(scan20(conv2), x, cp)
        key = f"resnet_{h}x{w}x{c}"
        results[key] = {"chain_ms": round(ms_chain, 3),
                        "conv2_ms": round(ms_conv, 3),
                        "nonconv_overhead_ms": round(ms_chain - ms_conv, 3)}
        print(key, results[key], flush=True)

    # --------------- 3. conv vs matmul at equal FLOPs
    b, h, w, c = 6, 64, 64, 320
    x = jnp.asarray(g.standard_normal((b, h, w, c)), dt)
    k33 = jnp.asarray(g.standard_normal((3, 3, c, c)), dt) * 0.02

    def conv33(xx, k):
        return jax.lax.conv_general_dilated(
            xx, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    m = jnp.asarray(g.standard_normal((b * h * w, 9 * c)), dt)
    km = jnp.asarray(g.standard_normal((9 * c, c)), dt) * 0.02

    def mm(a_, k_):
        return jnp.dot(a_, k_)

    ms_conv33 = ms_per_step(scan20(conv33), x, k33)
    ms_mm = ms_per_step(scan20(lambda a_, k_: mm(a_, k_)), m, km)
    fl = 2.0 * b * h * w * 9 * c * c
    results["conv_vs_matmul_64x64x320"] = {
        "conv_ms": round(ms_conv33, 3), "matmul_ms": round(ms_mm, 3),
        "conv_tflops": round(fl / ms_conv33 / 1e9, 1),
        "matmul_tflops": round(fl / ms_mm / 1e9, 1),
    }
    print(results["conv_vs_matmul_64x64x320"], flush=True)

    # --------------- 4. trunk batch scaling (B=6 vs B=24)
    if not args.quick:
        a6 = (jnp.concatenate([x2] * 3, 0), params["controlnet"]["static"],
              jnp.concatenate([t2] * 3, 0), jnp.concatenate([ctx2] * 3, 0),
              jnp.concatenate([emb2] * 3, 0))
        a24 = (jnp.concatenate([x2] * 12, 0), params["controlnet"]["static"],
               jnp.concatenate([t2] * 12, 0), jnp.concatenate([ctx2] * 12, 0),
               jnp.concatenate([emb2] * 12, 0))
        ms6 = ms_per_step(scan20(trunk), *a6)
        ms24 = ms_per_step(scan20(trunk), *a24)
        results["trunk_scaling"] = {
            "b6_ms": round(ms6, 2), "b24_ms": round(ms24, 2),
            "per_sample_b6": round(ms6 / 6, 3),
            "per_sample_b24": round(ms24 / 24, 3),
        }
        print(results["trunk_scaling"], flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
