"""End-to-end pipeline test on a tiny model stack: one jitted generate call
from prompts + six control images to [0,1] images, determinism, CFG and
latent passthrough semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgestyle_tpu.models.clip_text import CLIPTextConfig
from edgestyle_tpu.models.vae import VAEConfig
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
from tests.test_unet import TINY

TINY_PIPE = PipelineConfig(
    unet=TINY,
    vae=VAEConfig(block_out_channels=(32, 64), layers_per_block=1, sample_size=32),
    clip=CLIPTextConfig(
        vocab_size=100, hidden_size=24, num_layers=2, num_heads=2,
        max_positions=7, intermediate_size=32,
    ),
    dtype="float32",
)


@pytest.fixture(scope="module")
def pipe_and_params():
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
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


def test_generate_shapes_and_range(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    out = pipe(params, ids, neg, imgs, num_inference_steps=3)
    assert out.shape == (1, 32, 32, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and o.min() >= 0.0 and o.max() <= 1.0


def test_generate_deterministic_given_rng(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    a = pipe(params, ids, neg, imgs, rng=jax.random.key(7), num_inference_steps=2)
    b = pipe(params, ids, neg, imgs, rng=jax.random.key(7), num_inference_steps=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = pipe(params, ids, neg, imgs, rng=jax.random.key(8), num_inference_steps=2)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_latents_passthrough_and_return(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    out_lat = pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=2, return_latents=True
    )
    assert out_lat.shape == lat.shape
    # same starting latents → same result regardless of rng
    out_lat2 = pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=2,
        rng=jax.random.key(99), return_latents=True,
    )
    np.testing.assert_array_equal(np.asarray(out_lat), np.asarray(out_lat2))


def test_guidance_scale_has_effect(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    a = pipe(params, ids, neg, imgs, latents=lat, guidance_scale=1.0,
             num_inference_steps=2, return_latents=True)
    b = pipe(params, ids, neg, imgs, latents=lat, guidance_scale=7.5,
             num_inference_steps=2, return_latents=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def _bump_heads(params):
    """Zero-init controlnet heads make residuals 0 regardless of scale;
    give them weight so conditioning is observable."""
    import jax as _jax

    def bump(tree):
        return _jax.tree.map(lambda p: p + 0.01, tree)

    params = dict(params)
    params["controlnet"] = {
        k: (
            {kk: (bump(vv) if kk.startswith("controlnet_") else vv) for kk, vv in v.items()}
            if k != "fusion"
            else v
        )
        for k, v in params["controlnet"].items()
    }
    return params


def test_conditioning_scale_has_effect(pipe_and_params, rng):
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    a = pipe(params, ids, neg, imgs, latents=lat, num_inference_steps=2,
             conditioning_scale=[1.0] * 6, return_latents=True)
    b = pipe(params, ids, neg, imgs, latents=lat, num_inference_steps=2,
             conditioning_scale=[0.0] * 6, return_latents=True)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_check_inputs_validation(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    with pytest.raises(ValueError, match="control images"):
        pipe(params, ids, neg, imgs[:5], num_inference_steps=1)
    with pytest.raises(ValueError, match="divisible by 8"):
        bad = list(imgs)
        bad[2] = jnp.zeros((1, 30, 30, 3))
        pipe(params, ids, neg, bad, num_inference_steps=1)
    with pytest.raises(ValueError, match="prompt ids"):
        pipe(params, ids, neg[:1, :5] if neg.shape[1] > 5 else neg[:, :5], imgs)
    with pytest.raises(ValueError, match="latents"):
        pipe(params, ids, neg, imgs, latents=jnp.zeros((1, 8, 8, 4)),
             num_inference_steps=1)


def test_four_branch_legacy_pattern(rng):
    """The reference's older 4-branch layout (inference.py:500-521,
    controlnet-0..3 = pattern (0, None, 1, None)) runs through the same
    pipeline via PipelineConfig.pattern."""
    import dataclasses

    cfg = dataclasses.replace(TINY_PIPE, pattern=(0, None, 1, None))
    assert cfg.num_branches == 4 and cfg.latent_branches == (0, 2)
    pipe = EdgeStylePipeline(cfg, attn_impl="xla")
    params = pipe.init_params(jax.random.key(0))
    assert set(params["controlnet"]) == {"static", "fusion", "lora_0", "lora_1"}
    ids, neg, imgs = _inputs(rng)
    out = pipe(params, ids, neg, imgs[:4], rng=jax.random.key(1),
               num_inference_steps=2, guidance_scale=3.5)
    img = np.asarray(jax.tree.leaves(out)[0])
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0


def test_generate_dp_matches_single_device(pipe_and_params, rng):
    """VERDICT r2 item 3: data-parallel batch inference. B=8 sharded over
    the 8-device virtual mesh must produce the same images as the plain
    single-device program (same global shapes + partitionable threefry →
    identical per-element math up to GSPMD scheduling)."""
    from edgestyle_tpu.core.mesh import DATA_AXIS, MeshSpec, make_mesh

    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng, b=8)
    single = pipe(params, ids, neg, imgs, rng=jax.random.key(3),
                  num_inference_steps=2)

    mesh = make_mesh(MeshSpec(data=8, model=1))
    dp = pipe.generate_dp(mesh, params, ids, neg, imgs,
                          rng=jax.random.key(3), num_inference_steps=2)
    # the computation really spanned all 8 mesh devices
    assert len(dp.sharding.device_set) == 8
    assert np.asarray(dp).shape == (8, 32, 32, 3)
    np.testing.assert_allclose(
        np.asarray(dp), np.asarray(single), rtol=1e-5, atol=1e-5
    )

    with pytest.raises(ValueError, match="divisible"):
        i3, n3, im3 = _inputs(rng, b=3)
        pipe.generate_dp(mesh, params, i3, n3, im3, num_inference_steps=1)


def test_batched_requests_match_sequential(pipe_and_params, rng):
    """Serving batcher contract: B requests with different guidance and
    different seed-latents, run as ONE batched generation, must equal the
    B single-request runs (per-sample guidance vector + latent rows)."""
    pipe, params = pipe_and_params
    B = 3
    ids, neg, imgs = _inputs(rng, b=B)
    gs = [2.0, 3.5, 7.0]
    lat = jnp.stack([
        jax.random.normal(jax.random.key(s), (16, 16, 4), jnp.float32)
        for s in (10, 11, 12)
    ])
    batched = pipe(params, ids, neg, imgs, latents=lat,
                   guidance_scale=jnp.asarray(gs), num_inference_steps=2)
    for j in range(B):
        one = pipe(
            params, ids[j:j+1], neg[j:j+1], [im[j:j+1] for im in imgs],
            latents=lat[j:j+1], guidance_scale=gs[j], num_inference_steps=2,
        )
        np.testing.assert_allclose(
            np.asarray(batched[j]), np.asarray(one[0]), rtol=2e-5, atol=2e-5,
            err_msg=f"request {j}",
        )

    with pytest.raises(ValueError, match="guidance_scale"):
        pipe(params, ids, neg, imgs, guidance_scale=jnp.ones((2,)),
             num_inference_steps=1)


def test_control_guidance_windows(pipe_and_params, rng):
    """control_guidance_start/end become the reference's controlnet_keep
    mask (edgestyle_pipeline.py:419-427)."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    key = jax.random.key(3)

    # keep formula matches the reference exactly
    sc = np.asarray(pipe._step_scales(4, [2.0] * 6, 0.3, 0.8))
    n = 4
    for i in range(n):
        keep = 1.0 - float(i / n < 0.3 or (i + 1) / n > 0.8)
        np.testing.assert_allclose(sc[i], 2.0 * keep)
    # per-branch windows broadcast
    sc = np.asarray(pipe._step_scales(2, None, [0.0] * 6, [1.0] * 5 + [0.0]))
    assert sc[:, :5].min() == 1.0 and (sc[:, 5] == 0.0).all()

    # start=1.0 masks every step == conditioning_scale 0 everywhere
    a = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2,
             control_guidance_start=1.0)
    b = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2,
             conditioning_scale=[0.0] * 6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # default windows reproduce the plain path bit-exactly
    c = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2)
    d = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2,
             control_guidance_start=0.0, control_guidance_end=1.0)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
    # a real window changes the result
    e = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2,
             control_guidance_end=0.5)
    assert not np.array_equal(np.asarray(c), np.asarray(e))


@pytest.mark.heavy
def test_guess_mode(pipe_and_params, rng):
    """guess_mode: logspace residual ramp + cond-half-only controlnet with
    zero residuals for the uncond half (reference controllora.py:256-266,
    edgestyle_pipeline.py:453-497)."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    key = jax.random.key(5)

    out = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2,
               guess_mode=True)
    o = np.asarray(out)
    assert o.shape == (1, 32, 32, 3) and np.isfinite(o).all()
    base = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2)
    assert not np.array_equal(o, np.asarray(base))

    # MCN-level: guess residuals == manual logspace scaling of plain ones
    b = 1
    lat_hw = TINY_PIPE.vae.sample_size // pipe.vae_downscale
    x = jnp.asarray(rng.standard_normal((b, lat_hw, lat_hw, 4)), jnp.float32)
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.asarray(
        rng.standard_normal((b, 7, TINY_PIPE.unet.cross_attention_dim)), jnp.float32
    )
    embs = pipe.embed_cond_images(params, imgs)

    # capture the PRE-fusion residuals to verify the exact logspace ramp
    # (fusion is nonlinear, so post-fusion outputs can't show it)
    class _CaptureFusion:
        def apply(self, variables, down_lists, mid_list):
            return down_lists, mid_list

    mcn, real_fusion = pipe.mcn, pipe.mcn.fusion
    mcn.fusion = _CaptureFusion()
    try:
        d_g, m_g = mcn(params["controlnet"], x, t, ctx, embs, None,
                       guess_mode=True)
        d_p, m_p = mcn(params["controlnet"], x, t, ctx, embs, None,
                       guess_mode=False)
    finally:
        mcn.fusion = real_fusion
    n_resid = len(d_p[0])
    ramp = np.logspace(-1.0, 0.0, n_resid + 1)
    for p in range(len(d_p)):
        for j in range(n_resid):
            np.testing.assert_allclose(
                np.asarray(d_g[p][j]), np.asarray(d_p[p][j]) * ramp[j],
                rtol=2e-5, atol=1e-6,
            )
        np.testing.assert_allclose(
            np.asarray(m_g[p]), np.asarray(m_p[p]) * ramp[-1],
            rtol=2e-5, atol=1e-6,
        )


def test_controlnet_cache_interval_validation(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    for name in ("controlnet_cache_interval", "unet_cache_interval"):
        for bad in (0, -1, 1.5, "2"):
            with pytest.raises(ValueError, match=name):
                pipe(params, ids, neg, imgs, num_inference_steps=1,
                     **{name: bad})


@pytest.mark.heavy
def test_controlnet_cache_matches_manual_loop(pipe_and_params, rng):
    """controlnet_cache_interval=2 equals a host-side reimplementation of
    the caching semantics (refresh the six-branch residuals at even steps,
    reuse them otherwise), and genuinely diverges from the exact path."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    steps, k = 5, 2
    got = pipe(params, ids, neg, imgs, latents=lat, num_inference_steps=steps,
               controlnet_cache_interval=k, return_latents=True)

    context = pipe.encode_prompt(params, ids, neg)
    embs = pipe.embed_cond_images(params, imgs)
    embs2 = [jnp.concatenate([e, e], axis=0) for e in embs]
    plan = pipe.scheduler.plan(steps)
    scales = pipe._step_scales(steps, None, 0.0, 1.0)
    g = jnp.float32(3.5)
    state = pipe.scheduler.init_state(lat.shape, lat.dtype)
    sample, cache = lat, None
    for i in range(steps):
        t = plan.timesteps[i]
        if i % k == 0:
            cache = pipe._residual_step(
                params, context, embs, embs2, scales, 1, False, sample, t, i
            )
        down, mid = cache
        x2 = jnp.concatenate([sample, sample], axis=0)
        t2 = jnp.broadcast_to(t, (2,))
        noise = pipe.unet.apply(
            {"params": params["unet"]}, x2, t2, context,
            down_block_additional_residuals=down,
            mid_block_additional_residual=mid,
        )
        un, cd = jnp.split(noise, 2, axis=0)
        sample, state = pipe.scheduler.step(
            plan, i, un + g * (cd - un), sample, state
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(sample), rtol=1e-4, atol=5e-4
    )

    exact = pipe(params, ids, neg, imgs, latents=lat,
                 num_inference_steps=steps, return_latents=True)
    assert not np.allclose(np.asarray(got), np.asarray(exact))


@pytest.mark.heavy
def test_unet_cache_matches_manual_loop(pipe_and_params, rng):
    """unet_cache_interval=2 equals a host-side reimplementation of the
    DeepCache semantics (capture the deep feature at even steps via
    return_deep, splice it back via shallow_forward otherwise), and
    genuinely diverges from the exact path."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    steps, k = 5, 2
    got = pipe(params, ids, neg, imgs, latents=lat, num_inference_steps=steps,
               unet_cache_interval=k, return_latents=True)

    context = pipe.encode_prompt(params, ids, neg)
    embs = pipe.embed_cond_images(params, imgs)
    embs2 = [jnp.concatenate([e, e], axis=0) for e in embs]
    plan = pipe.scheduler.plan(steps)
    scales = pipe._step_scales(steps, None, 0.0, 1.0)
    g = jnp.float32(3.5)
    state = pipe.scheduler.init_state(lat.shape, lat.dtype)
    sample, deep = lat, None
    for i in range(steps):
        t = plan.timesteps[i]
        down, mid = pipe._residual_step(
            params, context, embs, embs2, scales, 1, False, sample, t, i
        )
        x2 = jnp.concatenate([sample, sample], axis=0)
        t2 = jnp.broadcast_to(t, (2,))
        if i % k == 0:
            noise, deep = pipe.unet.apply(
                {"params": params["unet"]}, x2, t2, context,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
                return_deep=True,
            )
        else:
            noise = pipe.unet.apply(
                {"params": params["unet"]}, x2, t2, context, deep,
                down_block_additional_residuals=down,
                method="shallow_forward",
            )
        un, cd = jnp.split(noise, 2, axis=0)
        sample, state = pipe.scheduler.step(
            plan, i, un + g * (cd - un), sample, state
        )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(sample), rtol=1e-4, atol=5e-4
    )

    exact = pipe(params, ids, neg, imgs, latents=lat,
                 num_inference_steps=steps, return_latents=True)
    assert not np.allclose(np.asarray(got), np.asarray(exact))


def test_combined_caches_run_and_differ(pipe_and_params, rng):
    """controlnet_cache_interval and unet_cache_interval compose in one
    scan (the recommended aligned serving mode) and each contributes its
    own divergence."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    run = lambda **kw: np.asarray(pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=5,
        return_latents=True, **kw,
    ))
    both = run(controlnet_cache_interval=2, unet_cache_interval=2)
    assert np.isfinite(both).all()
    cn_only = run(controlnet_cache_interval=2)
    unet_only = run(unet_cache_interval=2)
    exact = run()
    for other in (cn_only, unet_only, exact):
        assert not np.array_equal(both, other)


def test_controlnet_cache_guess_mode_runs(pipe_and_params, rng):
    """The cache carries the post-CFG-concat residual layout, so guess mode
    (cond-half compute + zero uncond residuals) composes with it."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    key = jax.random.key(11)
    out = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=3,
               guess_mode=True, controlnet_cache_interval=2)
    o = np.asarray(out)
    assert o.shape == (1, 32, 32, 3) and np.isfinite(o).all()
    base = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=3,
                guess_mode=True)
    assert not np.array_equal(o, np.asarray(base))


@pytest.mark.heavy
def test_guess_mode_cache_refresh_in_cfg_off_window_keeps_zero_uncond(
    pipe_and_params, rng
):
    """A ControlNet-cache refresh during a CFG-off step must store ZEROS in
    the uncond half under guess mode, so later CFG-on steps keep the
    reference's zero-uncond-residual contract (edgestyle_pipeline.py:453-497)
    instead of consuming duplicated conditional rows. Pinned against a
    host loop: refresh only at step 0 (off-window), steps 2-3 CFG-on read
    that refresh."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    steps = 4
    got = pipe(params, ids, neg, imgs, latents=lat, num_inference_steps=steps,
               guidance_scale=3.5, guess_mode=True, cfg_interval=(0.5, 1.0),
               controlnet_cache_steps=(0,), return_latents=True)

    context = pipe.encode_prompt(params, ids, neg)
    embs = pipe.embed_cond_images(params, imgs)
    plan = pipe.scheduler.plan(steps)
    scales = pipe._step_scales(steps, None, 0.0, 1.0)
    g = jnp.float32(3.5)
    state = pipe.scheduler.init_state(lat.shape, lat.dtype)
    sample = lat
    cached = None
    for i in range(steps):
        t = plan.timesteps[i]
        t1 = jnp.broadcast_to(t, (1,))
        if i == 0:  # the only refresh: cond-only rows (off-window step)
            cached = pipe.mcn(params["controlnet"], sample, t1, context[1:],
                              embs, scales[i], guess_mode=True)
        down_c, mid_c = cached
        cfg_on = (i / steps >= 0.5) and ((i + 1) / steps <= 1.0)
        if cfg_on:
            # guess mode: uncond half of the residuals is ZERO
            down = tuple(
                jnp.concatenate([jnp.zeros_like(d), d], axis=0)
                for d in down_c
            )
            mid = jnp.concatenate([jnp.zeros_like(mid_c), mid_c], axis=0)
            x2 = jnp.concatenate([sample, sample], axis=0)
            t2 = jnp.broadcast_to(t, (2,))
            noise = pipe.unet.apply(
                {"params": params["unet"]}, x2, t2, context,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            )
            un, cd = jnp.split(noise, 2, axis=0)
            out = un + g * (cd - un)
        else:
            out = pipe.unet.apply(
                {"params": params["unet"]}, sample, t1, context[1:],
                down_block_additional_residuals=down_c,
                mid_block_additional_residual=mid_c,
            ).astype(jnp.float32)
        sample, state = pipe.scheduler.step(plan, i, out, sample, state)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(sample), rtol=1e-4, atol=5e-4
    )


def test_generate_tp_matches_single_device(pipe_and_params, rng):
    """Tensor-parallel generation: attention/FF kernels sharded over the
    `model` axis (DPxTP 2x2 mesh) must reproduce the single-device images
    up to reduction order, and the kernels must actually shard."""
    from edgestyle_tpu.core.mesh import MODEL_AXIS, MeshSpec, make_mesh

    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng, b=2)
    single = pipe(params, ids, neg, imgs, rng=jax.random.key(3),
                  num_inference_steps=2)

    mesh = make_mesh(MeshSpec(data=2, model=2), devices=jax.devices()[:4])
    tp = pipe.generate_tp(mesh, params, ids, neg, imgs,
                          rng=jax.random.key(3), num_inference_steps=2)
    assert len(tp.sharding.device_set) == 4
    np.testing.assert_allclose(
        np.asarray(tp), np.asarray(single), rtol=2e-4, atol=2e-4
    )

    # the sharding genuinely split at least the UNet attention kernels
    from edgestyle_tpu.core.partitioning import shard_params_tp
    from edgestyle_tpu.core.porting import flatten

    flat = flatten(shard_params_tp(mesh, params["unet"]))
    sharded = [
        k for k, v in flat.items()
        if k.endswith("to_q.kernel")
        and len(v.sharding.device_set) == 4
        and v.sharding.spec == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    ]
    assert sharded, "no attention kernel actually TP-sharded"

    with pytest.raises(ValueError, match="divisible"):
        i3, n3, im3 = _inputs(rng, b=3)
        pipe.generate_tp(mesh, params, i3, n3, im3, num_inference_steps=1)


def test_cfg_interval_validation(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    for bad in ((-0.1, 1.0), (0.0, 1.2), (1.0, 0.0), 0.5, "x", (0.2,)):
        with pytest.raises(ValueError, match="cfg_interval"):
            pipe(params, ids, neg, imgs, num_inference_steps=1,
                 cfg_interval=bad)
    # start == end is LEGAL since the static CFG-off feature: ANY empty
    # window disables guidance statically ((0.0, 0.0) is just canonical)
    out = pipe(params, ids, neg, imgs, num_inference_steps=1,
               cfg_interval=(0.5, 0.5))
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_interval_full_window_is_exact(pipe_and_params, rng):
    """(0.0, 1.0) must leave the program untouched (cfg_on=None path):
    bitwise-identical outputs."""
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    key = jax.random.key(5)
    a = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2)
    b = pipe(params, ids, neg, imgs, rng=key, num_inference_steps=2,
             cfg_interval=(0.0, 1.0))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_interval_matches_manual_loop(pipe_and_params, rng):
    """cfg_interval=(0, 0.4) over 5 steps = CFG on steps 0-1, cond-only
    (half-batch) prediction on steps 2-4 — equals a host-side loop that
    implements exactly that, and diverges from the always-CFG path."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    steps = 5
    got = pipe(params, ids, neg, imgs, latents=lat, num_inference_steps=steps,
               guidance_scale=3.5, cfg_interval=(0.0, 0.4),
               return_latents=True)

    context = pipe.encode_prompt(params, ids, neg)
    embs = pipe.embed_cond_images(params, imgs)
    embs2 = [jnp.concatenate([e, e], axis=0) for e in embs]
    plan = pipe.scheduler.plan(steps)
    scales = pipe._step_scales(steps, None, 0.0, 1.0)
    g = jnp.float32(3.5)
    state = pipe.scheduler.init_state(lat.shape, lat.dtype)
    sample = lat
    for i in range(steps):
        t = plan.timesteps[i]
        cfg_on = (i / steps >= 0.0) and ((i + 1) / steps <= 0.4)
        if cfg_on:
            down, mid = pipe._residual_step(
                params, context, embs, embs2, scales, 1, False, sample, t, i
            )
            x2 = jnp.concatenate([sample, sample], axis=0)
            t2 = jnp.broadcast_to(t, (2,))
            noise = pipe.unet.apply(
                {"params": params["unet"]}, x2, t2, context,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            )
            un, cd = jnp.split(noise, 2, axis=0)
            out = un + g * (cd - un)
        else:
            t1 = jnp.broadcast_to(t, (1,))
            down, mid = pipe.mcn(
                params["controlnet"], sample, t1, context[1:], embs,
                scales[i],
            )
            out = pipe.unet.apply(
                {"params": params["unet"]}, sample, t1, context[1:],
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            ).astype(jnp.float32)
        sample, state = pipe.scheduler.step(plan, i, out, sample, state)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(sample), rtol=1e-4, atol=5e-4
    )

    exact = pipe(params, ids, neg, imgs, latents=lat,
                 num_inference_steps=steps, return_latents=True)
    assert not np.allclose(np.asarray(got), np.asarray(exact))


@pytest.mark.heavy
def test_cfg_interval_composes_with_caches(pipe_and_params, rng):
    """cfg_interval + both cache intervals run in one scan; each knob
    contributes its own divergence, and guess mode still runs."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    run = lambda **kw: np.asarray(pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=5,
        return_latents=True, **kw,
    ))
    combo = run(controlnet_cache_interval=2, unet_cache_interval=2,
                cfg_interval=(0.0, 0.4))
    assert np.isfinite(combo).all()
    caches_only = run(controlnet_cache_interval=2, unet_cache_interval=2)
    cfg_only = run(cfg_interval=(0.0, 0.4))
    exact = run()
    for other in (caches_only, cfg_only, exact):
        assert not np.array_equal(combo, other)

    gm = np.asarray(pipe(
        params, ids, neg, imgs, rng=jax.random.key(11),
        num_inference_steps=3, guess_mode=True, cfg_interval=(0.0, 0.5),
        controlnet_cache_interval=2,
    ))
    assert np.isfinite(gm).all()


def test_cache_steps_equal_interval(pipe_and_params, rng):
    """Explicit refresh-step tuples are the non-uniform generalization of
    the interval knobs: steps=range(0, N, k) must reproduce interval=k
    exactly, and an every-step schedule must reproduce the exact path."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    steps = 5
    run = lambda **kw: np.asarray(pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=steps,
        return_latents=True, **kw,
    ))
    np.testing.assert_array_equal(
        run(controlnet_cache_steps=tuple(range(0, steps, 2))),
        run(controlnet_cache_interval=2),
    )
    np.testing.assert_array_equal(
        run(unet_cache_steps=tuple(range(0, steps, 2))),
        run(unet_cache_interval=2),
    )
    # refresh-every-step normalizes to the exact (cache-free) program
    np.testing.assert_array_equal(
        run(controlnet_cache_steps=tuple(range(steps))), run()
    )


def test_cache_steps_nonuniform_runs_and_differs(pipe_and_params, rng):
    """A front-loaded schedule (same refresh count as uniform k=2) runs,
    stays finite, and genuinely differs from both uniform and exact; it
    composes with the cfg window and the unet-steps knob in one scan."""
    pipe, params = pipe_and_params
    params = _bump_heads(params)
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    steps = 5
    run = lambda **kw: np.asarray(pipe(
        params, ids, neg, imgs, latents=lat, num_inference_steps=steps,
        return_latents=True, **kw,
    ))
    front = run(controlnet_cache_steps=(0, 1, 3))  # 3 refreshes, early-heavy
    uniform = run(controlnet_cache_interval=2)     # 3 refreshes, even
    exact = run()
    assert np.isfinite(front).all()
    assert not np.array_equal(front, uniform)
    assert not np.array_equal(front, exact)
    combo = run(controlnet_cache_steps=(0, 1, 3), unet_cache_steps=(0, 2),
                cfg_interval=(0.0, 0.4))
    assert np.isfinite(combo).all()
    assert not np.array_equal(combo, front)


def test_cache_steps_validation(pipe_and_params, rng):
    pipe, params = pipe_and_params
    ids, neg, imgs = _inputs(rng)
    call = lambda **kw: pipe(params, ids, neg, imgs,
                             num_inference_steps=4, **kw)
    for name in ("controlnet_cache_steps", "unet_cache_steps"):
        with pytest.raises(ValueError, match="include step 0"):
            call(**{name: (1, 2)})
        with pytest.raises(ValueError, match="num_inference_steps"):
            call(**{name: (0, 4)})
        with pytest.raises(ValueError, match="iterable of ints"):
            call(**{name: ("a", "b")})
        with pytest.raises(ValueError, match="include step 0"):
            call(**{name: ()})
    with pytest.raises(ValueError, match="mutually exclusive"):
        call(controlnet_cache_steps=(0, 2), controlnet_cache_interval=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        call(unet_cache_steps=(0, 2), unet_cache_interval=2)


def test_dpm_scheduler_generate(pipe_and_params, rng):
    """scheduler='dpm++' (DPM-Solver++ 2M) runs the same generate surface
    as UniPC: correct shapes/range, deterministic given rng, a genuinely
    different sampler trajectory, and full composition with the serving
    knobs (caches + cfg window) in one scan."""
    import dataclasses

    pipe_u, params = pipe_and_params
    pipe_d = EdgeStylePipeline(
        dataclasses.replace(TINY_PIPE, scheduler="dpm++"), attn_impl="xla"
    )
    ids, neg, imgs = _inputs(rng)
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    run = lambda p, **kw: np.asarray(p(
        params, ids, neg, imgs, latents=lat, num_inference_steps=4,
        return_latents=True, **kw,
    ))
    d1, d2, u = run(pipe_d), run(pipe_d), run(pipe_u)
    np.testing.assert_array_equal(d1, d2)
    assert np.isfinite(d1).all()
    assert not np.array_equal(d1, u)  # different sampler, different path
    img = np.asarray(pipe_d(params, ids, neg, imgs, num_inference_steps=2))
    assert img.shape == (1, 32, 32, 3)
    assert np.isfinite(img).all() and img.min() >= 0.0 and img.max() <= 1.0
    combo = run(pipe_d, controlnet_cache_interval=2, unet_cache_interval=2,
                cfg_interval=(0.0, 0.5))
    assert np.isfinite(combo).all()
    assert not np.array_equal(combo, d1)


def test_unknown_scheduler_rejected():
    import dataclasses

    with pytest.raises(ValueError, match="unknown scheduler"):
        EdgeStylePipeline(dataclasses.replace(TINY_PIPE, scheduler="euler"))
