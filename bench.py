"""Benchmark harness — prints ONE JSON line per config (default: ALL
configs, north-star try-on first; the driver records every line).

BASELINE.json's five configs are all runnable:
  tryon      (default) full 6-branch try-on, 512px, 20 steps, CFG, bf16
  vae        sd-vae-ft-mse encode→decode roundtrip, one 512×512 image
  sam        EfficientViT-L2-SAM mask extraction (box prompt, multimask)
  unet_cn    SD1.5 UNet 20-step denoise with a single ControlNet, CFG
  train      ControlLoRA finetune step (Prodigy, snr_gamma 5, bs2×ga32 on
             one chip — the reference recipe shape)

Baseline: the reference publishes no numbers (BASELINE.md); its deployment
target is Jetson Orin/ONNX at 20 steps. 30 s/image is the documented Orin
estimate for the 6-branch config; vs_baseline > 10 meets the target.

Timing notes: block_until_ready does not flush the axon tunnel — a host
readback is required (see utils/profiling.timeit).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

JETSON_ORIN_BASELINE_IMAGES_PER_SEC = 1.0 / 30.0


def _sync(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def _time(fn, iters=3):
    out = fn(0)
    _sync(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(i + 1)
    _sync(out)
    return (time.time() - t0) / iters


def _tryon_bench(metric, b=1, steps=20, guidance=3.5, quant=None,
                 scheduler="unipc", **call_kwargs):
    """Shared harness for every try-on serving config: one full 512px
    6-branch pipeline, random-init bf16 params, fixed seeded inputs; the
    variants differ only in batch size, scheduler/quant construction and
    the per-call serving knobs."""
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig

    pipe = EdgeStylePipeline(
        PipelineConfig(dtype="bfloat16", scheduler=scheduler),
        attn_impl="auto", quant=quant,
    )
    params = pipe.init_params(jax.random.key(0))
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 49000, (b, 77)), jnp.int32)
    neg = jnp.asarray(rng.integers(1, 49000, (b, 77)), jnp.int32)
    imgs = [jnp.asarray(rng.standard_normal((b, 512, 512, 3)), jnp.float32) * 0.1
            for _ in range(6)]
    dt = _time(lambda s: pipe(params, ids, neg, imgs, rng=jax.random.key(s),
                              num_inference_steps=steps,
                              guidance_scale=guidance, **call_kwargs))
    ips = b / dt
    return {
        "metric": metric, "value": round(ips, 4), "unit": "images/sec",
        "vs_baseline": round(ips / JETSON_ORIN_BASELINE_IMAGES_PER_SEC, 2),
    }


def bench_tryon():
    return _tryon_bench("tryon_images_per_sec_512px_20steps_6branch")


def bench_vae():
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.models.vae import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(VAEConfig(), dtype=jnp.bfloat16)
    img = jax.random.normal(jax.random.key(0), (1, 512, 512, 3))
    p = jax.jit(vae.init)(jax.random.key(1), img)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    f = jax.jit(lambda p, x: vae.apply(p, vae.apply(p, x, method=vae.encode),
                                       method=vae.decode))
    dt = _time(lambda s: f(p, img), iters=10)
    return {"metric": "vae_roundtrip_512px_ms", "value": round(dt * 1e3, 2),
            "unit": "ms", "vs_baseline": None}


def bench_sam():
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.models.efficientvit.sam import (
        SAM_L2, EfficientViTSam, boxes_to_points, preprocess_sam_image)

    sam = EfficientViTSam(SAM_L2, dtype=jnp.bfloat16)
    img = preprocess_sam_image(jax.random.uniform(jax.random.key(0), (1, 512, 512, 3)))
    pts, lbl = boxes_to_points(jnp.array([[100.0, 150.0, 400.0, 480.0]]))
    p = jax.jit(sam.init)(jax.random.key(1), img, pts, lbl)
    f = jax.jit(lambda p, i, pt, lb: sam.apply(p, i, pt, lb, multimask_output=True))
    dt = _time(lambda s: f(p, img, pts, lbl), iters=10)
    return {"metric": "sam_l2_mask_forward_512px_ms", "value": round(dt * 1e3, 2),
            "unit": "ms", "vs_baseline": None}


def bench_unet_cn():
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.models.unet import SD15UNet, UNetConfig

    cfg = UNetConfig()
    unet = SD15UNet(cfg, dtype=jnp.bfloat16, attn_impl="auto")
    cn = SD15UNet(cfg, controlnet_mode=True, dtype=jnp.bfloat16, attn_impl="auto")
    x = jax.random.normal(jax.random.key(0), (2, 64, 64, 4))
    t = jnp.zeros((2,), jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (2, 77, 768))
    emb = jax.random.normal(jax.random.key(2), (2, 64, 64, 320))
    up = jax.jit(unet.init)(jax.random.key(3), x, t, ctx)
    cp = jax.jit(lambda r: cn.init(r, x, t, ctx, emb, method="controlnet_forward"))(
        jax.random.key(4))
    up = jax.tree.map(lambda a: a.astype(jnp.bfloat16), up)
    cp = jax.tree.map(lambda a: a.astype(jnp.bfloat16), cp)

    @jax.jit
    def step(up, cp, x, t, ctx, emb):
        down, mid = cn.apply(cp, x, t, ctx, emb, method="controlnet_forward")
        return unet.apply(up, x, t, ctx, down_block_additional_residuals=down,
                          mid_block_additional_residual=mid)

    dt = _time(lambda s: step(up, cp, x, t, ctx, emb), iters=10)
    return {"metric": "unet_single_controlnet_step_cfg2_ms",
            "value": round(dt * 1e3, 2), "unit": "ms", "vs_baseline": None}


def bench_train():
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
    from edgestyle_tpu.training.train_step import (
        TrainConfig, init_trainable, make_optimizer, make_train_step)

    pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"))
    params = pipe.init_params(jax.random.key(0))
    frozen = {"vae": params["vae"], "clip": params["clip"], "unet": params["unet"],
              "static": params["controlnet"]["static"]}
    unet_p = params["unet"]
    del params  # free the merged inference-only lora branches (HBM headroom)
    cfg = TrainConfig(grad_accum=1)
    trainable = init_trainable(pipe, jax.random.key(1), unet_p, 32)
    state = {"trainable": trainable, "opt_state": make_optimizer(cfg).init(trainable),
             "step": jnp.zeros([], jnp.int32)}
    g = np.random.default_rng(0)
    # microbatch 2 = the reference recipe's bs2 (README.md:73) and 14%
    # better per-sample than mb=1 (dW convs amortize; BASELINE.md r3)
    mb = 2
    img = lambda: jnp.asarray(g.standard_normal((1, mb, 512, 512, 3)), jnp.float32) * 0.2
    batch = {"original": img(), "agnostic": img(), "head": img(), "clothes": img(), "clothes2": img(),
             "original_openpose": img(), "clothes_openpose": img(),
             "clothes_openpose2": img(),
             "input_ids": jnp.asarray(g.integers(1, 49000, (1, mb, 77)), jnp.int32)}
    step = jax.jit(make_train_step(pipe, cfg))

    def run(s):
        ns, m = step(state, frozen, batch, jax.random.key(s))
        return m["loss"]

    dt = _time(run, iters=3)
    # per-sample time; the reference recipe (bs2×ga32) is 64 samples/step
    return {"metric": "controllora_train_step_per_sample_s",
            "value": round(dt / mb, 3), "unit": "s", "vs_baseline": None}


def bench_tryon_b4():
    """Serving-throughput variant: batch 4 (B=1 is the latency headline)."""
    return _tryon_bench("tryon_throughput_b4_images_per_sec", b=4)


def bench_fused():
    """North-star fused program: raw photos + keypoints → try-on image,
    ONE XLA program (SAM masks ×3 + pose render ×3 + 20-step 6-branch
    generation + VAE decode)."""
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.pipelines.full import FusedTryOn
    from edgestyle_tpu.pipelines.preprocess import TryOnPreprocessor
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig

    pipe = EdgeStylePipeline(PipelineConfig(dtype="bfloat16"), attn_impl="auto")
    preproc = TryOnPreprocessor(dtype=jnp.bfloat16)
    fused = FusedTryOn(preproc, pipe)
    pp = preproc.init_params(jax.random.key(1))
    params = {"sam": pp["sam"], "decoders": pp["decoders"],
              "gen": pipe.init_params(jax.random.key(0))}
    params = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p, params
    )
    rng = np.random.default_rng(0)
    photo = lambda: jnp.asarray(rng.random((512, 512, 3)), jnp.float32)
    kps = jnp.asarray(rng.random((3, 18, 2)) * 512, jnp.float32)
    ids = jnp.asarray(rng.integers(1, 49000, (1, 77)), jnp.int32)
    neg = jnp.asarray(rng.integers(1, 49000, (1, 77)), jnp.int32)
    s, c1, c2 = photo(), photo(), photo()
    dt = _time(lambda i: fused(params, s, c1, c2, kps, ids, neg,
                               jax.random.key(i), num_inference_steps=20))
    return {"metric": "fused_photos_to_tryon_s_20steps", "value": round(dt, 3),
            "unit": "s",
            "vs_baseline": round((1.0 / dt) / JETSON_ORIN_BASELINE_IMAGES_PER_SEC, 2)}


def bench_tryon_int8_b4():
    """Opt-in (not in --config all): B=4 serving throughput with the W8A8
    int8-static path (ops/quant.py). Kept out of the default set because
    the calibration + int8 program compiles add ~20 min on a cold cache
    and the mode itself is opt-in; BASELINE.md carries the measurements."""
    return _tryon_bench("tryon_int8_static_b4_images_per_sec", b=4,
                        quant="int8-static")


def bench_tryon_cached():
    """Opt-in (not in --config all): B=1 latency with the ControlNet-residual
    cache at interval 2 (the six-branch MCN runs every 2nd step). An
    approximation of reference semantics — quality deltas live in
    BASELINE.md next to the throughput numbers."""
    return _tryon_bench("tryon_cached_k2_images_per_sec",
                        controlnet_cache_interval=2)


def bench_tryon_cached_stack():
    """Opt-in (not in --config all): B=1 latency with BOTH opt-in caches
    stacked — ControlNet residuals at interval 3, UNet deep feature at
    interval 2 (the recommended aggressive serving mode, SSIM 0.990 in
    the random-weight harness). Quality deltas: BASELINE.md "UNet
    deep-feature cache"."""
    return _tryon_bench("tryon_cached_stack_cn3_unet2_images_per_sec",
                        controlnet_cache_interval=3, unet_cache_interval=2)


def bench_tryon_cfg():
    """Opt-in (not in --config all): B=1 latency with the CFG step window
    (guidance on the first 40% of steps only; later steps skip the uncond
    half and run at half batch — the guidance-interval / adaptive-guidance
    approximation). Quality deltas: BASELINE.md "CFG step window"."""
    return _tryon_bench("tryon_cfg_window_0.4_images_per_sec",
                        cfg_interval=(0.0, 0.4))


def bench_tryon_fast():
    """The recommended aggressive serving mode (--mode aggressive on
    tryon/serve) — CFG window (0, 0.4) + ControlNet-residual cache k=3.
    Measured 2.12x over exact at SSIM 0.9988 (BASELINE.md "CFG step
    window"); emitted by default so the serving rate is machine-visible
    round over round."""
    return _tryon_bench("tryon_fast_cfg0.4_cn3_images_per_sec",
                        cfg_interval=(0.0, 0.4), controlnet_cache_interval=3)


def bench_tryon_dpm():
    """Opt-in (not in --config all): the headline try-on with the
    DPM-Solver++ 2M sampler instead of UniPC (same NFE — this pins that
    the scheduler swap is perf-neutral)."""
    return _tryon_bench("tryon_dpmpp_images_per_sec", scheduler="dpm++")


def bench_tryon_lcm():
    """Opt-in (not in --config all): 4-step LCM sampling with CFG
    statically off — the serving shape for LCM-LoRA distilled adapters
    (apps/distill.py; --mode lcm on tryon/serve). With random weights this
    measures SPEED only (quality requires a distilled checkpoint)."""
    return _tryon_bench("tryon_lcm4_images_per_sec", scheduler="lcm",
                        steps=4, guidance=1.0, cfg_interval=(0.0, 0.0))


# Order matters: the exact-semantics headline FIRST (a driver timeout must
# keep it), then the CHEAP regression signals (vae/sam/unet_cn/train — the
# r3 driver timeout ate exactly these when they were queued last), then the
# expensive variants. tryon_fast is the recommended aggressive serving mode
# (cfg window 0.4 + ControlNet-residual cache k=3; 2.12x over exact at SSIM
# 0.9988, BASELINE.md "CFG step window").
CONFIGS = {"tryon": bench_tryon, "vae": bench_vae, "sam": bench_sam,
           "unet_cn": bench_unet_cn, "train": bench_train,
           "tryon_b4": bench_tryon_b4, "fused": bench_fused,
           "tryon_fast": bench_tryon_fast}
# Watchdog GROUPS for "all" mode: each group runs in ONE subprocess under a
# wall-clock cap. Grouping matters because every fresh process pays a
# 1.5-3 min axon-tunnel client init (measured r4: 8 single-config
# subprocesses = 25 min wall even warm/uncontended, of which device work is
# seconds) — four groups keep the whole run ~10-14 min while a wedge or
# runaway compile still can't eat anything OUTSIDE its group, and lines
# already printed before a group timeout are salvaged from the killed
# child's partial stdout. Caps sum to 1500 s = the default global budget;
# sized for a WARM persistent compile cache (a cold full-pipeline compile
# is ~8 min — first-ever runs may trip these; rerun once warm).
CONFIG_GROUPS = [
    (("tryon",), 360),
    (("vae", "sam", "unet_cn", "train"), 420),
    (("tryon_b4", "tryon_fast"), 420),
    (("fused",), 300),
]
# runnable by name but excluded from --config all (opt-in feature; heavy
# extra compiles)
OPTIONAL_CONFIGS = {"tryon_int8_b4": bench_tryon_int8_b4,
                    "tryon_cached": bench_tryon_cached,
                    "tryon_cached_stack": bench_tryon_cached_stack,
                    "tryon_cfg": bench_tryon_cfg,
                    "tryon_dpm": bench_tryon_dpm,
                    "tryon_lcm": bench_tryon_lcm}


def _run_one_inprocess(names):
    """Run configs in THIS process, printing one JSON line each."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    runnable = {**CONFIGS, **OPTIONAL_CONFIGS}
    for name in names:
        try:
            line = json.dumps(runnable[name]())
        except Exception as e:  # noqa: BLE001
            line = json.dumps({"metric": name, "error": f"{type(e).__name__}: {e}"})
        print(line, flush=True)


def _run_all(budget_s):
    """Watchdogged "all" mode: config GROUPS run in their own subprocess
    with a wall-clock cap, so a tunnel wedge or runaway compile can never
    eat anything outside its group (the r3 failure mode — BENCH_r03 rc:124
    lost 6 of 8 configs). On a group timeout, lines the child already
    printed are salvaged from its partial stdout and only the unfinished
    configs get error lines. A global budget bounds the whole run; groups
    that would not fit emit explicit skip lines instead of silently
    vanishing. The headline line is re-emitted LAST because the driver's
    `parsed` field records the final line."""
    deadline = time.monotonic() + budget_s
    lines = {}

    # child lines carry either the config's metric name (success) or the
    # config name itself (in-child error line)
    metric_of = {
        "tryon": "tryon_images_per_sec_512px_20steps_6branch",
        "vae": "vae_roundtrip_512px_ms",
        "sam": "sam_l2_mask_forward_512px_ms",
        "unet_cn": "unet_single_controlnet_step_cfg2_ms",
        "train": "controllora_train_step_per_sample_s",
        "tryon_b4": "tryon_throughput_b4_images_per_sec",
        "fused": "fused_photos_to_tryon_s_20steps",
        "tryon_fast": "tryon_fast_cfg0.4_cn3_images_per_sec",
    }

    def emit(raw_stdout, names, err):
        got = set()
        for ln in (raw_stdout or "").splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
                try:
                    m = json.loads(ln).get("metric", "")
                except ValueError:
                    continue
                for n in names:
                    if m in (n, metric_of.get(n)):
                        got.add(n)
                        lines[n] = ln
        for n in names:
            if n not in got:
                print(json.dumps({"metric": n, "error": err}), flush=True)

    for names, cap in CONFIG_GROUPS:
        remaining = deadline - time.monotonic()
        if remaining < 60:
            for n in names:
                print(json.dumps({"metric": n,
                                  "error": f"skipped: global budget {budget_s}s exhausted"}),
                      flush=True)
            continue
        cap = min(cap, int(remaining))
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--config", ",".join(names)],
                cwd=os.path.dirname(os.path.abspath(__file__)),
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                stdin=subprocess.DEVNULL, timeout=cap, text=True,
            )
            emit(proc.stdout, names, f"no output (rc {proc.returncode})")
        except subprocess.TimeoutExpired as e:
            out = e.stdout
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            emit(out, names,
                 f"timeout after {int(time.monotonic() - t0)}s (group cap {cap}s)")
    # the driver's parsed field takes the LAST line — make it the headline
    if "tryon" in lines:
        print(lines["tryon"], flush=True)


def main():
    ap = argparse.ArgumentParser()
    # default "all": the driver's BENCH_r{N}.json should carry every config
    # (VERDICT r2 item 5) so VAE/SAM/train regressions are machine-visible;
    # the headline try-on metric stays the FIRST line emitted (and is
    # repeated as the last line for the driver's parsed field).
    ap.add_argument(
        "--config", default="all",
        help="'all', one config name, or a comma-separated list run "
             "in-process (choices: %s)"
             % ", ".join(list(CONFIGS) + list(OPTIONAL_CONFIGS)),
    )
    ap.add_argument(
        "--budget", type=float,
        default=float(os.environ.get("EDGESTYLE_BENCH_BUDGET", 1500)),
        help="global wall-clock budget (s) for --config all",
    )
    args = ap.parse_args()
    if args.config == "all":
        _run_all(args.budget)
    else:
        names = [n.strip() for n in args.config.split(",") if n.strip()]
        runnable = {**CONFIGS, **OPTIONAL_CONFIGS}
        unknown = [n for n in names if n not in runnable]
        if unknown:
            ap.error(f"unknown config(s) {unknown}; choose from "
                     f"{sorted(runnable)} or 'all'")
        _run_one_inprocess(names)


if __name__ == "__main__":
    main()
