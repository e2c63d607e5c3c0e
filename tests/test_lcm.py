"""LCM scheduler + LCM-LoRA distillation tests.

The LCM sampler (schedulers/lcm.py) is validated against a float64 numpy
transcription of diffusers' scheduling_lcm.py (the dynamic host-loop
original) with shared per-step noise; the distillation step
(training/distill.py) runs on the tiny pipeline — loss finite, only the
LoRA adapters move, EMA target math, fresh-adapter identity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline
from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
from edgestyle_tpu.schedulers.lcm import LCMScheduler
from edgestyle_tpu.training.distill import (
    DistillConfig,
    apply_lcm_lora,
    init_distill_state,
    init_unet_lora_params,
    make_distill_step,
)
from tests.test_pipeline import TINY_PIPE


# ===================================================== diffusers LCM ref
class DiffusersLCMRef:
    """float64 transcription of diffusers scheduling_lcm.py (strength=1,
    epsilon prediction, timestep_scaling=10, sigma_data=0.5)."""

    def __init__(self, alphas_cumprod, original_inference_steps=50,
                 timestep_scaling=10.0, sigma_data=0.5):
        self.ac = np.asarray(alphas_cumprod, np.float64)
        self.T = len(self.ac)
        self.orig = original_inference_steps
        self.scaling = timestep_scaling
        self.sigma_data = sigma_data

    def set_timesteps(self, n):
        k = self.T // self.orig
        origin = np.arange(1, self.orig + 1, dtype=np.int64) * k - 1
        idx = np.floor(np.linspace(0, len(origin), n, endpoint=False)).astype(
            np.int64
        )
        self.timesteps = origin[::-1][idx]
        self.n = n

    def scalings(self, t):
        st = float(t) * self.scaling
        sd2 = self.sigma_data**2
        return sd2 / (st**2 + sd2), st / np.sqrt(st**2 + sd2)

    def step(self, eps, i, sample, noise):
        t = self.timesteps[i]
        a_t = np.sqrt(self.ac[t])
        s_t = np.sqrt(1.0 - self.ac[t])
        c_skip, c_out = self.scalings(t)
        x0 = (sample - s_t * eps) / a_t
        denoised = c_out * x0 + c_skip * sample
        if i == self.n - 1:
            return denoised
        prev_t = self.timesteps[i + 1]
        return (
            np.sqrt(self.ac[prev_t]) * denoised
            + np.sqrt(1.0 - self.ac[prev_t]) * noise
        )


def test_timestep_grid_matches_diffusers():
    s = LCMScheduler(NoiseSchedule.sd15())
    for n in (1, 2, 4, 8, 16):
        ref = DiffusersLCMRef(s.sched.alphas_cumprod)
        ref.set_timesteps(n)
        np.testing.assert_array_equal(s.timestep_grid(n), ref.timesteps)
    # SD15/50-grid spot values (k=20): 4 steps → 999, 759, 499, 259
    np.testing.assert_array_equal(s.timestep_grid(4), [999, 759, 499, 259])
    # off-grid request is an error (cannot sample finer than distilled)
    with pytest.raises(ValueError):
        s.timestep_grid(51)


def test_sampler_exact_under_perfect_model():
    """Independent-of-transcription correctness anchor (r5): with an
    ANALYTICALLY perfect ε model for a fixed target x0 — ε(x,t) =
    (x − √ᾱ_t·x0)/√(1−ᾱ_t) — every LCM step's consistency estimate is x0
    exactly, so sampling at ANY step count must return x0 to float
    precision. This pins the grid/boundary/re-noise plumbing end to end
    without trusting a same-author transcription, and is the control that
    separated "LCM sampling is broken" from "an undistilled ε model's
    one-shot x̂0 at t≈T is ill-conditioned (÷√ᾱ≈0.007)" in the r5
    consistency-distillation close-out (BASELINE.md)."""
    sched = NoiseSchedule.sd15()
    ac = jnp.asarray(sched.alphas_cumprod)
    g = np.random.default_rng(0)
    x0 = jnp.asarray(g.standard_normal((2, 8, 8, 4)), jnp.float32)

    def eps_model(x, t, i):
        a = jnp.sqrt(ac[t])
        s = jnp.sqrt(1.0 - ac[t])
        return (x - a * x0) / s

    lat = jnp.asarray(g.standard_normal((2, 8, 8, 4)), jnp.float32)
    for orig, n in ((50, 4), (8, 4), (8, 1)):
        s = LCMScheduler(NoiseSchedule.sd15(), original_inference_steps=orig)
        plan = s.plan(n, rng=jax.random.key(1))
        out = s.sample_loop(plan, eps_model, lat, pass_step=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x0),
                                   atol=5e-5)


def test_trajectory_matches_transcription():
    sched = NoiseSchedule.sd15()
    s = LCMScheduler(sched)
    n = 6
    rng = jax.random.key(3)
    plan = s.plan(n, rng=rng)

    # toy deterministic ε-model, identical on both sides
    def model(sample, t):
        return 0.3 * sample * jnp.cos(t / 1000.0) + 0.05

    x = jax.random.normal(jax.random.key(0), (2, 4, 4, 3), jnp.float32)
    ours = np.asarray(s.sample_loop(plan, model, x))

    ref = DiffusersLCMRef(sched.alphas_cumprod)
    ref.set_timesteps(n)
    samp = np.asarray(x, np.float64)
    for i in range(n):
        t = ref.timesteps[i]
        eps = 0.3 * samp * np.cos(t / 1000.0) + 0.05
        noise = np.asarray(
            jax.random.normal(jax.random.fold_in(rng, i), x.shape, jnp.float32),
            np.float64,
        )
        samp = ref.step(eps, i, samp, noise)
    np.testing.assert_allclose(ours, samp, rtol=2e-4, atol=2e-5)


def test_boundary_conditions():
    from edgestyle_tpu.training.distill import _boundary_scalings

    cfg = DistillConfig()
    cs, co = _boundary_scalings(cfg, jnp.asarray([0, 999]), 2)
    assert cs.shape == (2, 1) and co.shape == (2, 1)
    # f(x, 0) = x: c_skip(0)=1, c_out(0)=0
    assert float(cs[0, 0]) == 1.0 and float(co[0, 0]) == 0.0
    # far from the boundary c_out dominates
    assert float(co[1, 0]) > 0.99 and float(cs[1, 0]) < 1e-5


# ===================================================== pipeline integration
@pytest.fixture(scope="module")
def lcm_pipe_and_params():
    pipe = EdgeStylePipeline(
        dataclasses.replace(TINY_PIPE, scheduler="lcm"), attn_impl="xla"
    )
    params = pipe.init_params(jax.random.key(0))
    return pipe, params


def _inputs(rng, b=1):
    ids = jnp.asarray(rng.integers(1, 99, size=(b, 7)), jnp.int32)
    neg = jnp.asarray(rng.integers(1, 99, size=(b, 7)), jnp.int32)
    imgs = [
        jnp.asarray(rng.standard_normal((b, 32, 32, 3)), jnp.float32) * 0.1
        for _ in range(6)
    ]
    return ids, neg, imgs


def test_lcm_generate(lcm_pipe_and_params, rng):
    pipe, params = lcm_pipe_and_params
    ids, neg, imgs = _inputs(rng)
    out = pipe(
        params, ids, neg, imgs, num_inference_steps=4, guidance_scale=1.0,
        cfg_interval=(0.0, 0.0),
    )
    o = np.asarray(out)
    assert o.shape == (1, 32, 32, 3)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0
    # the per-step stochastic re-noise makes the seed matter even with
    # fixed latents semantics
    out2 = pipe(
        params, ids, neg, imgs, num_inference_steps=4, guidance_scale=1.0,
        cfg_interval=(0.0, 0.0), rng=jax.random.key(5),
    )
    assert not np.array_equal(o, np.asarray(out2))


def test_cfg_off_matches_guidance_one(rng):
    # the statically guidance-free program (empty cfg window) must equal
    # full CFG at guidance 1.0 (uncond + 1·(cond − uncond) ≡ cond)
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    params = pipe.init_params(jax.random.key(0))
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    a = pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=3,
        guidance_scale=1.0, return_latents=True,
    )
    b = pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=3,
        guidance_scale=7.5, cfg_interval=(0.0, 0.0), return_latents=True,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


# ===================================================== distillation
@pytest.fixture(scope="module")
def distill_setup():
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    params = pipe.init_params(jax.random.key(0))
    frozen = {
        "vae": params["vae"],
        "clip": params["clip"],
        "unet": params["unet"],
        "static": params["controlnet"]["static"],
        "controlnet": params["controlnet"],
    }
    return pipe, params, frozen


def _batch(rng, ga=1, b=2):
    img = lambda: jnp.asarray(
        rng.standard_normal((ga, b, 32, 32, 3)), jnp.float32
    ) * 0.1
    pose = lambda: jnp.asarray(rng.random((ga, b, 32, 32, 3)), jnp.float32)
    return {
        "original": img(), "agnostic": img(), "head": img(),
        "clothes": img(), "clothes2": img(),
        "original_openpose": pose(), "clothes_openpose": pose(),
        "clothes_openpose2": pose(),
        "input_ids": jnp.asarray(rng.integers(1, 99, (ga, b, 7)), jnp.int32),
    }


def test_lora_covers_full_unet(distill_setup):
    pipe, params, _ = distill_setup
    lora = init_unet_lora_params(jax.random.key(1), params["unet"], rank=4)
    paths = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(lora)
    }
    assert any("up_blocks" in p for p in paths)
    assert any("down_blocks" in p for p in paths)
    assert any("mid_block" in p for p in paths)
    # never the controlnet zero-conv heads or conv kernels
    assert not any("controlnet_" in p for p in paths)


def test_fresh_lora_is_identity(distill_setup):
    pipe, params, _ = distill_setup
    lora = init_unet_lora_params(jax.random.key(1), params["unet"], rank=4)
    merged = apply_lcm_lora(params["unet"], lora)
    lat = jnp.ones((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 24))
    a = pipe.unet.apply({"params": params["unet"]}, lat, t, ctx)
    b = pipe.unet.apply({"params": merged}, lat, t, ctx)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.heavy
def test_distill_step_updates_lora_only(distill_setup, rng):
    pipe, params, frozen = distill_setup
    cfg = DistillConfig(lora_rank=4, grad_accum=1)
    state = init_distill_state(pipe, jax.random.key(1), params["unet"], cfg)
    assert "target" not in state  # online-target mode by default
    uncond_ctx = pipe.clip.apply(
        {"params": params["clip"]}, jnp.zeros((1, 7), jnp.int32)
    )["last_hidden_state"]
    step = jax.jit(make_distill_step(pipe, cfg))
    s1, m1 = step(state, frozen, _batch(rng), uncond_ctx, jax.random.key(2))
    assert np.isfinite(float(m1["loss"]))
    assert int(s1["step"]) == 1
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree.leaves(state["lcm_lora"]), jax.tree.leaves(s1["lcm_lora"])
        )
    )
    assert moved, "LoRA adapters did not move"


def test_distill_cli_parse():
    from edgestyle_tpu.apps.distill import parse_args

    a = parse_args([
        "--random_init", "--max_train_steps", "5", "--lora_rank", "8",
        "--ema_decay", "0.95", "--w_min", "4", "--w_max", "12",
    ])
    assert a.lora_rank == 8 and a.ema_decay == 0.95
    assert a.max_train_steps == 5 and (a.w_min, a.w_max) == (4.0, 12.0)
    # reference-shaped aliases shared with the other CLIs
    a = parse_args(["--pretrained_model_name_or_path", "x",
                    "--controlnet_model_name_or_path", "y"])
    assert a.pretrained_model == "x" and a.edgestyle_checkpoint == "y"


@pytest.mark.heavy
def test_distill_ema_target(distill_setup, rng):
    pipe, params, frozen = distill_setup
    cfg = DistillConfig(lora_rank=4, grad_accum=2, ema_decay=0.9)
    state = init_distill_state(pipe, jax.random.key(1), params["unet"], cfg)
    uncond_ctx = pipe.clip.apply(
        {"params": params["clip"]}, jnp.zeros((1, 7), jnp.int32)
    )["last_hidden_state"]
    step = jax.jit(make_distill_step(pipe, cfg))
    s1, m1 = step(
        state, frozen, _batch(rng, ga=2), uncond_ctx, jax.random.key(2)
    )
    assert np.isfinite(float(m1["loss"]))
    expect = jax.tree.map(
        lambda tg, on: 0.9 * tg + 0.1 * on, state["target"], s1["lcm_lora"]
    )
    for a, b in zip(jax.tree.leaves(expect), jax.tree.leaves(s1["target"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


# ===================================================== guidance mode
@pytest.mark.heavy
def test_guidance_mode_descends_fixed_objective(distill_setup, rng):
    """mode="guidance" is plain regression onto the frozen teacher's
    guided ε — with the batch AND rng pinned, repeated steps are
    full-batch gradient descent on a fixed target, so the loss MUST
    fall decisively (this also exercises the whole gradient path, which
    the wiring tests don't)."""
    pipe, params, frozen = distill_setup
    cfg = DistillConfig(mode="guidance", lora_rank=4, grad_accum=1,
                        learning_rate=1e-2, w_min=6.5, w_max=6.5)
    state = init_distill_state(pipe, jax.random.key(1), params["unet"], cfg)
    uncond_ctx = pipe.clip.apply(
        {"params": params["clip"]}, jnp.zeros((1, 7), jnp.int32)
    )["last_hidden_state"]
    step = jax.jit(make_distill_step(pipe, cfg))
    batch = _batch(rng)
    losses = []
    for _ in range(60):
        state, m = step(state, frozen, batch, uncond_ctx, jax.random.key(2))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # measured ≈1.4%/step at this lr/rank — 60 steps lands ≈0.43×
    assert losses[-1] < 0.6 * losses[0], (losses[0], losses[-1])


def test_guidance_mode_requires_pinned_w(distill_setup):
    """The guidance student has no w input — an unpinned w range makes the
    regression target random, so make_distill_step must reject it."""
    pipe, _, _ = distill_setup
    cfg = DistillConfig(mode="guidance", lora_rank=4, w_min=3.0, w_max=15.0)
    with pytest.raises(ValueError, match="pinned CFG scale"):
        make_distill_step(pipe, cfg)


def test_guidance_mode_lora_only_and_finite(distill_setup, rng):
    pipe, params, frozen = distill_setup
    cfg = DistillConfig(mode="guidance", lora_rank=4, grad_accum=2,
                        w_min=6.5, w_max=6.5)
    state = init_distill_state(pipe, jax.random.key(1), params["unet"], cfg)
    uncond_ctx = pipe.clip.apply(
        {"params": params["clip"]}, jnp.zeros((1, 7), jnp.int32)
    )["last_hidden_state"]
    step = jax.jit(make_distill_step(pipe, cfg))
    s1, m1 = step(
        state, frozen, _batch(rng, ga=2), uncond_ctx, jax.random.key(2)
    )
    assert np.isfinite(float(m1["loss"]))
    moved = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(
            jax.tree.leaves(state["lcm_lora"]), jax.tree.leaves(s1["lcm_lora"])
        )
    )
    assert moved


def test_unknown_distill_mode_raises(distill_setup, rng):
    pipe, params, frozen = distill_setup
    cfg = DistillConfig(mode="nope", lora_rank=4)
    state = init_distill_state(pipe, jax.random.key(1), params["unet"], cfg)
    uncond_ctx = pipe.clip.apply(
        {"params": params["clip"]}, jnp.zeros((1, 7), jnp.int32)
    )["last_hidden_state"]
    step = jax.jit(make_distill_step(pipe, cfg))
    with pytest.raises(ValueError, match="unknown distill mode"):
        step(state, frozen, _batch(rng), uncond_ctx, jax.random.key(2))


def test_distill_mode_cli():
    from edgestyle_tpu.apps.distill import parse_args

    a = parse_args(["--random_init", "--distill_mode", "guidance"])
    assert a.distill_mode == "guidance"


@pytest.mark.heavy
def test_distill_step_data_parallel_matches_single(distill_setup, rng):
    """VERDICT r3 item 6: shard-verify the distillation trainer the same
    way the ControlLoRA trainer is — identical jitted step, batch rows
    sharded over the mesh 'data' axis, params/uncond_ctx replicated,
    results ≡ single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from edgestyle_tpu.core.mesh import DATA_AXIS, MeshSpec, make_mesh

    pipe, params, frozen = distill_setup
    cfg = DistillConfig(lora_rank=4, grad_accum=1)
    state = init_distill_state(pipe, jax.random.key(1), params["unet"], cfg)
    uncond_ctx = pipe.clip.apply(
        {"params": params["clip"]}, jnp.zeros((1, 7), jnp.int32)
    )["last_hidden_state"]
    step = jax.jit(make_distill_step(pipe, cfg))
    batch = _batch(rng, ga=1, b=8)

    mesh = make_mesh(MeshSpec(data=8))
    shard = NamedSharding(mesh, P(None, DATA_AXIS))
    repl = NamedSharding(mesh, P())
    batch_s = jax.tree.map(lambda x: jax.device_put(x, shard), batch)
    state_r = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    frozen_r = jax.tree.map(lambda x: jax.device_put(x, repl), frozen)
    uc_r = jax.device_put(uncond_ctx, repl)

    s1, m1 = step(state, frozen, batch, uncond_ctx, jax.random.key(42))
    s2, m2 = step(state_r, frozen_r, batch_s, uc_r, jax.random.key(42))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1["lcm_lora"]), jax.tree.leaves(s2["lcm_lora"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
