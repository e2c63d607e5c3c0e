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
import threading
import time

import numpy as np

JETSON_ORIN_BASELINE_IMAGES_PER_SEC = 1.0 / 30.0

# Set in child mode (--prelim): _time emits a single-iteration preliminary
# line before the averaged one, so an internal-deadline kill still leaves a
# numeric record for the config (VERDICT r4 item 1).
_EMIT_PRELIM = False


def _sync(x):
    if isinstance(x, np.ndarray):  # fake-config test hook: host-only
        return
    import jax

    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def _time(fn, iters=3, mk=None):
    """Warm up (compile) with fn(0), then time `iters` calls. If `mk` is
    given and preliminary emission is on, the first timed iteration is
    printed immediately as a {"prelim": true} line — a timeout after that
    point still leaves a number in the artifact."""
    out = fn(0)
    _sync(out)
    t0 = time.time()
    out = fn(1)
    _sync(out)
    dt1 = time.time() - t0
    if mk is not None and _EMIT_PRELIM:
        print(json.dumps({**mk(dt1), "prelim": True}), flush=True)
    if iters <= 1:
        return dt1
    t0 = time.time()
    for i in range(iters - 1):
        out = fn(i + 2)
    _sync(out)
    return (dt1 + (time.time() - t0)) / iters


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
    mk = lambda dt: {
        "metric": metric, "value": round(b / dt, 4), "unit": "images/sec",
        "vs_baseline": round((b / dt) / JETSON_ORIN_BASELINE_IMAGES_PER_SEC, 2),
    }
    dt = _time(lambda s: pipe(params, ids, neg, imgs, rng=jax.random.key(s),
                              num_inference_steps=steps,
                              guidance_scale=guidance, **call_kwargs), mk=mk)
    return mk(dt)


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
    mk = lambda dt: {"metric": "vae_roundtrip_512px_ms",
                     "value": round(dt * 1e3, 2), "unit": "ms",
                     "vs_baseline": None}
    return mk(_time(lambda s: f(p, img), iters=10, mk=mk))


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
    mk = lambda dt: {"metric": "sam_l2_mask_forward_512px_ms",
                     "value": round(dt * 1e3, 2), "unit": "ms",
                     "vs_baseline": None}
    return mk(_time(lambda s: f(p, img, pts, lbl), iters=10, mk=mk))


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

    mk = lambda dt: {"metric": "unet_single_controlnet_step_cfg2_ms",
                     "value": round(dt * 1e3, 2), "unit": "ms",
                     "vs_baseline": None}
    return mk(_time(lambda s: step(up, cp, x, t, ctx, emb), iters=10, mk=mk))


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

    # per-sample time; the reference recipe (bs2×ga32) is 64 samples/step
    mk = lambda dt: {"metric": "controllora_train_step_per_sample_s",
                     "value": round(dt / mb, 3), "unit": "s",
                     "vs_baseline": None}
    return mk(_time(run, iters=3, mk=mk))


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
    mk = lambda dt: {
        "metric": "fused_photos_to_tryon_s_20steps", "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round((1.0 / dt) / JETSON_ORIN_BASELINE_IMAGES_PER_SEC, 2)}
    dt = _time(lambda i: fused(params, s, c1, c2, kps, ids, neg,
                               jax.random.key(i), num_inference_steps=20), mk=mk)
    return mk(dt)


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
    tryon/serve; re-derived from the steered-quality data, VERDICT r4
    item 2) — the front-loaded 7-refresh ControlNet schedule, the fastest
    lever meeting steered SSIM >= 0.94 (0.9660 @ 1.55x). Emitted by
    default so the serving rate is machine-visible round over round.
    (r3/r4 measured the old knobs cfg0.4+cn3 as
    tryon_fast_cfg0.4_cn3_images_per_sec.)"""
    return _tryon_bench("tryon_fast_cnfront7_images_per_sec",
                        controlnet_cache_steps=(0, 1, 2, 4, 7, 11, 16))


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


# Order matters twice over: the exact-semantics headline FIRST (a driver
# timeout must keep it), then the CHEAP regression signals, then the
# serving variants — and the two PROGRAMS WITH GIANT COMPILES (train's
# backward, the fused photos→try-on graph) dead LAST, because their
# cold remote compiles are the repeat offender that wedges the axon
# tunnel (r4 driver: train/fused group timeouts; r5: two live wedges both
# triggered inside bench_train's compile). Last place means a wedge can
# only eat them, never the headline. tryon_fast is the recommended
# aggressive serving mode (see apps/tryon.py apply_serving_mode).
CONFIGS = {"tryon": bench_tryon, "vae": bench_vae, "sam": bench_sam,
           "unet_cn": bench_unet_cn, "tryon_b4": bench_tryon_b4,
           "tryon_fast": bench_tryon_fast, "train": bench_train,
           "fused": bench_fused}
# Per-config INTERNAL deadlines (s) for "all" mode, enforced by a watchdog
# thread inside the single child process. Generous on purpose: unused time
# is not wasted (the next config starts immediately), the deadline only
# bounds how much a runaway compile or a tunnel wedge can eat. r4's group
# design spent its budget on 4 tunnel-client inits (1.5-3 min each) and
# lost the headline to a 360 s group cap; one process pays the init once
# and gives the headline the full 600 s VERDICT r4 prescribes.
CONFIG_DEADLINES = {
    "tryon": 600, "vae": 180, "sam": 180, "unet_cn": 240, "train": 420,
    "tryon_b4": 420, "fused": 420, "tryon_fast": 360,
}
# (r5c: vae/sam were 90 s and sam/unet_cn 90/150 — a cold compile under
# host-CPU contention blew the vae deadline on a single-core driver box;
# the global budget still bounds the worst case, so generous wins.)
# runnable by name but excluded from --config all (opt-in feature; heavy
# extra compiles)
OPTIONAL_CONFIGS = {"tryon_int8_b4": bench_tryon_int8_b4,
                    "tryon_cached": bench_tryon_cached,
                    "tryon_cached_stack": bench_tryon_cached_stack,
                    "tryon_cfg": bench_tryon_cfg,
                    "tryon_dpm": bench_tryon_dpm,
                    "tryon_lcm": bench_tryon_lcm}

METRIC_OF = {
    "tryon": "tryon_images_per_sec_512px_20steps_6branch",
    "vae": "vae_roundtrip_512px_ms",
    "sam": "sam_l2_mask_forward_512px_ms",
    "unet_cn": "unet_single_controlnet_step_cfg2_ms",
    "train": "controllora_train_step_per_sample_s",
    "tryon_b4": "tryon_throughput_b4_images_per_sec",
    "fused": "fused_photos_to_tryon_s_20steps",
    "tryon_fast": "tryon_fast_cnfront7_images_per_sec",
}
_CONFIG_OF_METRIC = {m: n for n, m in METRIC_OF.items()}


def _config_of(line):
    """Map a printed JSON line back to its config name (or None)."""
    try:
        m = json.loads(line).get("metric", "")
    except ValueError:
        return None
    return _CONFIG_OF_METRIC.get(m, m if m in METRIC_OF else None)


def _maybe_install_fakes():
    """Test hook: EDGESTYLE_BENCH_FAKE="name:behavior[:deadline_s],..."
    replaces the config tables with tiny host-only fakes so the "all"
    orchestration (watchdog deadlines, prelim fallback, respawn, budget
    skips) is testable without a device. Behaviors: ok | hang (wedges after
    the prelim iteration) | hang0 (wedges before any measurement) | crash
    (child dies mid-config). Propagates to children via the environment."""
    spec = os.environ.get("EDGESTYLE_BENCH_FAKE")
    if not spec:
        return
    for table in (CONFIGS, OPTIONAL_CONFIGS, CONFIG_DEADLINES, METRIC_OF,
                  _CONFIG_OF_METRIC):
        table.clear()
    for item in spec.split(","):
        parts = item.strip().split(":")
        name, behavior = parts[0], parts[1]
        secs = float(parts[2]) if len(parts) > 2 else 5.0

        def fake(name=name, behavior=behavior):
            mk = lambda dt: {"metric": name + "_metric",
                             "value": round(dt, 4), "unit": "s",
                             "vs_baseline": None}

            def fn(i):
                if behavior == "crash" and i >= 1:
                    os._exit(1)
                if behavior == "hang0" or (behavior == "hang" and i >= 2):
                    time.sleep(3600)
                time.sleep(0.01)
                return np.zeros(1)

            return mk(_time(fn, iters=3, mk=mk))

        CONFIGS[name] = fake
        CONFIG_DEADLINES[name] = secs
        METRIC_OF[name] = name + "_metric"
        _CONFIG_OF_METRIC[name + "_metric"] = name


def _run_one_inprocess(names, deadline=None):
    """Run configs in THIS process, printing one JSON line each.

    With `deadline` (monotonic, child mode): each config is additionally
    bounded by CONFIG_DEADLINES via a watchdog thread. A blocked tunnel RPC
    cannot be interrupted, so on expiry the watchdog prints an error line
    for the current config (its preliminary line, if one landed earlier,
    remains the config's numeric record) and hard-exits; the parent
    re-spawns one fresh child for the configs never attempted."""
    if not os.environ.get("EDGESTYLE_BENCH_FAKE"):
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if deadline is not None:
            # Pay the tunnel-client init (1.5-3 min on the axon backend)
            # OUTSIDE the first config's deadline, under its own watchdog:
            # a wedged tunnel dies here with an explicit line instead of
            # silently eating the headline's budget.
            ev = threading.Event()

            def _init_expired():
                if ev.is_set():
                    return
                print(json.dumps({"metric": "backend_init",
                                  "error": "device backend init exceeded "
                                           "300s (tunnel wedged?)"}),
                      flush=True)
                os._exit(4)

            t = threading.Timer(
                max(1.0, min(300.0, deadline - time.monotonic())),
                _init_expired)
            t.daemon = True
            t.start()
            np.asarray(jax.jit(lambda a: a + 1)(np.ones((8, 8), np.float32)))
            ev.set()
            t.cancel()
    runnable = {**CONFIGS, **OPTIONAL_CONFIGS}
    for name in names:
        cap = None
        if deadline is not None:
            remaining = deadline - time.monotonic()
            if remaining < 45:
                print(json.dumps({"metric": name,
                                  "error": "skipped: global budget exhausted"}),
                      flush=True)
                continue
            cap = min(CONFIG_DEADLINES.get(name, 300), remaining)
        done = threading.Event()

        def expire(name=name, cap=cap, done=done):
            if done.is_set():
                return
            print(json.dumps({
                "metric": name,
                "error": f"internal deadline {int(cap)}s expired"}), flush=True)
            os._exit(3)

        watchdog = None
        if cap is not None:
            watchdog = threading.Timer(cap, expire)
            watchdog.daemon = True
            watchdog.start()
        try:
            line = json.dumps(runnable[name]())
        except Exception as e:  # noqa: BLE001
            line = json.dumps({"metric": name, "error": f"{type(e).__name__}: {e}"})
        done.set()
        if watchdog is not None:
            watchdog.cancel()
        print(line, flush=True)


def _spawn_child(names, budget):
    """Start one child running `names` with prelim lines on; stream its
    stdout through a queue so lines reach OUR stdout in real time (the
    driver records whatever made it out if we in turn are killed)."""
    import queue

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--config", ",".join(names), "--prelim", "--child-budget",
         str(int(budget))],
        cwd=os.path.dirname(os.path.abspath(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        stdin=subprocess.DEVNULL, text=True,
    )
    q = queue.Queue()

    def reader():
        for ln in proc.stdout:
            q.put(ln.rstrip("\n"))
        q.put(None)

    threading.Thread(target=reader, daemon=True).start()
    return proc, q


def _run_all(budget_s):
    """Driver "all" mode (VERDICT r4 item 1). ONE child process runs every
    config in order — the 1.5-3 min axon tunnel-client init is paid once,
    not per group — with per-config internal watchdog deadlines inside the
    child, preliminary single-iteration lines as soon as a config has run
    once, and ONE respawn if the child dies with configs un-attempted.
    Final lines stream through in real time; a config whose final line
    never arrives falls back to its preliminary line, then to an explicit
    error line. The headline is re-emitted LAST because the driver's
    `parsed` field records the final line."""
    import queue

    deadline = time.monotonic() + budget_s
    final = {}    # config -> final success line
    prelim = {}   # config -> single-iteration line (fallback numeric record)
    errors = {}   # config -> error line the child printed
    todo = list(CONFIGS)

    # Respawn while budget remains AND children make progress. A child
    # that dies on a config's internal deadline ERRORS that config (never
    # retried), so respawns are bounded by the config count — the r5 "one
    # respawn" cap abandoned 5 of 8 configs with 2000+ s of budget left
    # when a COLD cache blew two small-config deadlines back to back. Two
    # consecutive children with zero new records (e.g. the tunnel wedges
    # during backend init, which is not config-attributed) stop the loop.
    no_progress = 0
    while True:
        pending = [n for n in todo
                   if n not in final and n not in errors and n not in prelim]
        remaining = deadline - time.monotonic()
        if not pending or remaining < 120 or no_progress >= 2:
            break
        seen_before = len(final) + len(errors) + len(prelim)
        proc, q = _spawn_child(pending, remaining)
        while True:
            try:
                ln = q.get(timeout=max(0.5, min(5.0, deadline - time.monotonic())))
            except queue.Empty:
                if time.monotonic() >= deadline:
                    proc.kill()
                    break
                continue
            if ln is None:
                break
            if not ln.startswith("{"):
                continue
            try:
                rec = json.loads(ln)
            except ValueError:
                continue
            print(ln, flush=True)  # real-time pass-through, nothing buffered
            name = _config_of(ln)
            if not name:
                continue
            if rec.get("prelim"):
                prelim[name] = ln
            elif "error" in rec:
                errors[name] = ln
            else:
                final[name] = ln
        proc.wait()
        progressed = (len(final) + len(errors) + len(prelim)) > seen_before
        no_progress = 0 if progressed else no_progress + 1

    for n in todo:
        if n not in final and n not in errors and n not in prelim:
            print(json.dumps({"metric": n,
                              "error": "not reached within budget "
                                       f"{int(budget_s)}s"}), flush=True)
    # the driver's parsed field takes the LAST line — make it the headline
    head = final.get("tryon") or prelim.get("tryon")
    if head:
        print(head, flush=True)


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
    ap.add_argument("--prelim", action="store_true",
                    help="emit {'prelim': true} single-iteration lines before "
                         "the averaged ones (the 'all' child sets this)")
    ap.add_argument("--child-budget", type=float, default=None,
                    help="internal: child-mode global deadline (s from now); "
                         "arms per-config watchdog deadlines")
    args = ap.parse_args()
    global _EMIT_PRELIM
    _EMIT_PRELIM = args.prelim
    _maybe_install_fakes()
    if args.config == "all":
        _run_all(args.budget)
    else:
        names = [n.strip() for n in args.config.split(",") if n.strip()]
        runnable = {**CONFIGS, **OPTIONAL_CONFIGS}
        unknown = [n for n in names if n not in runnable]
        if unknown:
            ap.error(f"unknown config(s) {unknown}; choose from "
                     f"{sorted(runnable)} or 'all'")
        deadline = (time.monotonic() + args.child_budget
                    if args.child_budget is not None else None)
        _run_one_inprocess(names, deadline=deadline)


if __name__ == "__main__":
    main()
