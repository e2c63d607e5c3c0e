"""ControlNet-residual-cache quality + throughput on the current backend.

Companion to quality_int8.py: same structured conditioning, shared weights
and noise, but the pair here isolates the opt-in ControlNet-residual cache
(controlnet_cache_interval=k — the six-branch MCN refreshes every k-th
UniPC step and its fused residuals are reused in between). Reports
SSIM/PSNR/MAE vs the exact k=1 program plus wall-clock img/s for both,
measured back-to-back in one session (the only apples-to-apples timing the
axon tunnel allows). Results are recorded in BASELINE.md.

NOTE on quality numbers: weights here are random-init (no network in this
image), so the SSIM measures how much the cached-residual trajectory
diverges for THIS architecture's dynamics, not trained-model quality.
The zero-init ControlNet heads are bumped (+0.01, as the pipeline tests
do) — otherwise every residual is exactly zero and caching is a no-op,
which makes the quality comparison vacuous (the first run of this script
measured exactly that: identical SSIM for k=2 and k=3 at the bf16 noise
floor).

Usage: python scripts/quality_cached.py [--steps 20] [--px 512] \
           [--intervals 2 3] [--batch 1]
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
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--intervals", type=int, nargs="+", default=[2, 3])
    ap.add_argument("--unet_intervals", type=int, nargs="+", default=[1],
                    help="unet_cache_interval values to pair with each "
                         "--intervals entry (DeepCache-style deep-feature "
                         "cache; the cross product of both lists is run, "
                         "k_cn=1 entries isolate the UNet cache alone)")
    ap.add_argument("--quant", choices=["none", "int8", "int8-static"],
                    default="none",
                    help="stack the cache on the W8A8 quant path: the "
                         "cached pipe runs quantized, the exact baseline "
                         "stays bf16 (measures the COMBINED serving mode)")
    ap.add_argument("--cfg_interval", type=float, nargs=2, default=(0.0, 1.0),
                    metavar=("START", "END"),
                    help="stack the CFG window on the approximate side: "
                         "guidance only inside this step-fraction window, "
                         "half-batch steps outside it; the exact baseline "
                         "keeps full CFG")
    ap.add_argument("--tome", type=float, default=0.0,
                    help="stack ToMe token merging (ops/tome.py) on the "
                         "approximate side at this ratio (0 = off)")
    ap.add_argument("--tome_mlp", action="store_true",
                    help="also merge the feed-forward (ToMe merge_mlp)")
    ap.add_argument("--cn_steps", type=int, nargs="+", default=None,
                    metavar="STEP",
                    help="measure an explicit (non-uniform) ControlNet "
                         "refresh schedule instead of the --intervals "
                         "cross-product (must include 0)")
    ap.add_argument("--unet_steps", type=int, nargs="+", default=None,
                    metavar="STEP",
                    help="explicit UNet deep-feature refresh schedule to "
                         "pair with --cn_steps (must include 0)")
    ap.add_argument("--scheduler", type=str, default="unipc",
                    choices=("unipc", "dpm++"),
                    help="sampler for BOTH sides of the A/B (exact baseline "
                         "and approximate pipe)")
    ap.add_argument("--approx_steps", type=int, nargs="+", default=None,
                    help="run the approximate side at these step counts "
                         "while the exact baseline keeps --steps (low-NFE "
                         "study: e.g. --steps 20 --approx_steps 15 12 10)")
    ap.add_argument("--approx_scheduler", type=str, default=None,
                    choices=("unipc", "dpm++"),
                    help="sampler for the approximate side only (defaults "
                         "to --scheduler; pair with --approx_steps for "
                         "sampler-vs-sampler low-NFE comparisons)")
    ap.add_argument("--trained", type=str, default=None,
                    help="STEERING trainable set from scripts/steer_train.py "
                         "(msgpack): replaces the random-init+bumped-heads "
                         "weights AND switches conditioning to the synth "
                         "distribution those weights were trained on — the "
                         "quality columns then measure deltas on a model "
                         "whose output measurably follows the conditioning "
                         "(VERDICT r3 item 3)")
    args = ap.parse_args()
    cfg_iv = (float(args.cfg_interval[0]), float(args.cfg_interval[1]))
    print(jax.default_backend(), jax.devices(), flush=True)

    b = args.batch
    g = np.random.default_rng(0)
    if args.trained:
        # in-distribution conditioning for the steering weights
        from steer_train import cond_list, synth_batch

        sb = synth_batch(np.random.default_rng(5), b, args.px)
        ids = sb["input_ids"]
        neg = jnp.zeros_like(ids)
        imgs = cond_list(sb)
    else:
        ids = jnp.asarray(g.integers(1, 49000, (b, 77)), jnp.int32)
        neg = jnp.asarray(g.integers(1, 49000, (b, 77)), jnp.int32)
        imgs = structured_images(g, b, args.px)

    pcfg = PipelineConfig(dtype="bfloat16", scheduler=args.scheduler)
    pipe = EdgeStylePipeline(pcfg, attn_impl="auto")
    tome = None
    if args.tome > 0:
        from edgestyle_tpu.ops.tome import ToMeConfig

        tome = ToMeConfig(ratio=args.tome, merge_mlp=args.tome_mlp)
    approx_steps_list = args.approx_steps or [args.steps]
    qcfg = (pcfg if args.approx_scheduler is None
            else PipelineConfig(dtype="bfloat16", scheduler=args.approx_scheduler))
    qpipe = (
        pipe if args.quant == "none" and tome is None and qcfg is pcfg
        else EdgeStylePipeline(qcfg, attn_impl="auto", quant=args.quant, tome=tome)
    )
    params = pipe.init_params(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        params,
    )
    if args.trained:
        # steering weights: trained heads/LoRA/fusion replace the bump
        import flax.serialization as fser

        from edgestyle_tpu.training.train_step import init_trainable
        from edgestyle_tpu.training.validation import assemble_inference_params

        template = init_trainable(pipe, jax.random.key(1), params["unet"])
        with open(args.trained, "rb") as f:
            trainable = fser.from_bytes(template, f.read())
        trainable = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.bfloat16), trainable
        )
        frozen = {"vae": params["vae"], "clip": params["clip"],
                  "unet": params["unet"],
                  "static": params["controlnet"]["static"]}
        params = assemble_inference_params(frozen, trainable)
    else:
        # give the zero-init controlnet heads weight so residuals are
        # nonzero and the cache actually changes the trajectory
        bump = lambda tree: jax.tree.map(lambda p: p + jnp.asarray(0.01, p.dtype), tree)
        params = dict(params)
        params["controlnet"] = {
            k: (
                {kk: (bump(vv) if kk.startswith("controlnet_") else vv)
                 for kk, vv in v.items()}
                if k != "fusion" else v
            )
            for k, v in params["controlnet"].items()
        }

    def run(k=1, ku=1, p=None, cn_steps=None, unet_steps=None,
            n_steps=None):
        exact_side = p is not None
        return (p if exact_side else qpipe)(
            params, ids, neg, imgs, rng=jax.random.key(7),
            num_inference_steps=args.steps if exact_side
            else (n_steps or approx_steps_list[0]),
            guidance_scale=3.5,
            controlnet_cache_interval=k, unet_cache_interval=ku,
            controlnet_cache_steps=cn_steps, unet_cache_steps=unet_steps,
            cfg_interval=(0.0, 1.0) if exact_side else cfg_iv,
        )

    # the exact baseline is always the plain bf16 k=1 program
    exact = np.asarray(run(1, p=pipe), np.float32)
    print(f"exact out std={exact.std():.4f}", flush=True)
    t1 = timeit(lambda: run(1, p=pipe), iters=3)

    def report(ok, tk, **extra):
        results = {
            "tryon_ssim_exact_vs_cached": round(
                float(jnp.mean(ssim(jnp.asarray(exact), jnp.asarray(ok)))), 5
            ),
            "tryon_psnr_db": round(
                float(jnp.mean(psnr(jnp.asarray(exact), jnp.asarray(ok)))), 2
            ),
            "tryon_mae": round(float(np.abs(exact - ok).mean()), 5),
            "steps": args.steps,
            "approx_scheduler": args.approx_scheduler or args.scheduler,
            "px": args.px,
            "batch": b,
            "cfg_interval": list(cfg_iv),
            "tome": args.tome,
            "quant": args.quant,
            "trained": bool(args.trained),
            "exact_img_s": round(b / t1, 4),
            "cached_img_s": round(b / tk, 4),
            "cached_speedup": round(t1 / tk, 3),
            **extra,
        }
        print(json.dumps(results), flush=True)

    if args.cn_steps or args.unet_steps:
        cn = tuple(args.cn_steps) if args.cn_steps else None
        us = tuple(args.unet_steps) if args.unet_steps else None
        ok = np.asarray(run(cn_steps=cn, unet_steps=us), np.float32)
        tk = timeit(lambda: run(cn_steps=cn, unet_steps=us), iters=3)
        report(ok, tk, approx_steps=approx_steps_list[0],
               cache_steps=list(cn or ()), unet_cache_steps=list(us or ()))
        return

    for n in approx_steps_list:
        for k in args.intervals:
            for ku in args.unet_intervals:
                if (k == 1 and ku == 1 and cfg_iv == (0.0, 1.0)
                        and tome is None and qpipe is pipe
                        and n == args.steps):
                    continue  # identical to the exact baseline
                ok = np.asarray(run(k, ku, n_steps=n), np.float32)
                tk = timeit(lambda: run(k, ku, n_steps=n), iters=3)
                report(ok, tk, approx_steps=n,
                       cache_interval=k, unet_cache_interval=ku)


if __name__ == "__main__":
    main()
