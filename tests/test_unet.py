"""UNet / ControlNet / ControlLoRA tests (tiny config for speed).

Full-size architectural parity is anchored by exact param counts vs
diffusers (UNet 859,520,964; ControlNet 361,279,120 incl. cond embedding),
checked in test_param_counts_match_diffusers via eval_shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.unet import (
    SD15UNet,
    UNetConfig,
    controllora_params,
    init_lora_params,
    merge_lora,
    split_trunk_params,
)

TINY = UNetConfig(
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_dim=24,
    num_heads=2,
    cond_embedding_channels=(8, 16),
)


@pytest.fixture(scope="module")
def tiny_unet():
    unet = SD15UNet(TINY, attn_impl="xla")
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 24))
    params = unet.init(jax.random.key(0), x, t, ctx)
    return unet, params


@pytest.fixture(scope="module")
def tiny_controlnet():
    cn = SD15UNet(TINY, controlnet_mode=True, attn_impl="xla")
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 7, 24))
    emb = jnp.zeros((1, 16, 16, 32))
    params = cn.init(jax.random.key(1), x, t, ctx, emb, method="controlnet_forward")
    return cn, params


def test_unet_forward_shape_and_jit(tiny_unet, rng):
    unet, params = tiny_unet
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4), dtype=np.float32))
    t = jnp.array([10, 500], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24), dtype=np.float32))
    out = jax.jit(unet.apply)(params, x, t, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_controlnet_residual_shapes_and_zero_init(tiny_controlnet, tiny_unet, rng):
    cn, params = tiny_controlnet
    unet, uparams = tiny_unet
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4), dtype=np.float32))
    t = jnp.array([3], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 24), dtype=np.float32))
    emb = jnp.asarray(rng.standard_normal((1, 16, 16, 32), dtype=np.float32))
    down, mid = jax.jit(
        lambda p, *a: cn.apply(p, *a, method="controlnet_forward")
    )(params, x, t, ctx, emb)
    # tiny cfg: skips = conv_in + (1 resnet + 1 down) + (1 resnet) = 4
    assert len(down) == 4
    assert down[0].shape == (1, 16, 16, 32)
    assert down[-1].shape == (1, 8, 8, 64)
    assert mid.shape == (1, 8, 8, 64)
    # zero-conv heads → residuals are exactly zero at init
    for r in list(down) + [mid]:
        assert np.abs(np.asarray(r)).max() == 0.0

    # injecting zero residuals must not change the UNet output
    base = unet.apply(uparams, x, t, ctx)
    with_res = unet.apply(
        uparams, x, t, ctx,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_res), atol=1e-6)


def test_conditioning_scale(tiny_controlnet, rng):
    cn, params = tiny_controlnet
    # give the zero convs some weight so scaling is observable
    params = jax.tree.map(
        lambda p: p + 0.01 if p.ndim == 4 else p, params
    )
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4), dtype=np.float32))
    t = jnp.array([3], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 24), dtype=np.float32))
    emb = jnp.asarray(rng.standard_normal((1, 16, 16, 32), dtype=np.float32))
    f = lambda s: cn.apply(params, x, t, ctx, emb, s, method="controlnet_forward")
    d1, m1 = f(1.0)
    d2, m2 = f(0.5)
    np.testing.assert_allclose(np.asarray(m2), 0.5 * np.asarray(m1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d2[0]), 0.5 * np.asarray(d1[0]), rtol=1e-5)


def _skip_residuals(rng, cfg, b, hw, scale=0.01):
    """Random residual tensors matching the UNet skip structure (and the
    mid shape) — same layout as a ControlNet's outputs."""
    shapes = []
    h = hw
    chs = cfg.block_out_channels
    shapes.append((b, h, h, chs[0]))
    for i, ch in enumerate(chs):
        shapes += [(b, h, h, ch)] * cfg.layers_per_block
        if i < len(chs) - 1:
            h //= 2
            shapes.append((b, h, h, ch))
    down = tuple(
        jnp.asarray(rng.standard_normal(s), jnp.float32) * scale for s in shapes
    )
    mid = jnp.asarray(rng.standard_normal((b, h, h, chs[-1])), jnp.float32) * scale
    return down, mid


def test_shallow_forward_exactness(tiny_unet, rng):
    """shallow_forward with a deep feature captured at the SAME (sample, t)
    reproduces the full forward — the consistency anchor of the
    unet_cache_interval (DeepCache-style) approximation: on refresh steps
    the cached program equals the exact one, so ALL divergence comes from
    feature staleness, never from the splice itself."""
    unet, params = tiny_unet
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4), dtype=np.float32))
    t = jnp.array([10, 500], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24), dtype=np.float32))
    down, mid = _skip_residuals(rng, TINY, 2, 16)

    full = jax.jit(
        lambda p, x, t, c, d, m: unet.apply(
            p, x, t, c, down_block_additional_residuals=d,
            mid_block_additional_residual=m, return_deep=True,
        )
    )
    out_full, deep = full(params, x, t, ctx, down, mid)
    # deep = input to the last up block: full latent res, chs[1] channels
    assert deep.shape == (2, 16, 16, TINY.block_out_channels[1])

    shallow = jax.jit(
        lambda p, x, t, c, deep, d: unet.apply(
            p, x, t, c, deep, down_block_additional_residuals=d,
            method="shallow_forward",
        )
    )
    out_shallow = shallow(params, x, t, ctx, deep, down)
    np.testing.assert_allclose(
        np.asarray(out_shallow), np.asarray(out_full), rtol=1e-5, atol=1e-6
    )

    # a stale deep feature (from a different sample) must actually matter
    out2, deep2 = full(params, x * 0.5, t, ctx, down, mid)
    out_stale = shallow(params, x, t, ctx, deep2, down)
    assert not np.allclose(np.asarray(out_stale), np.asarray(out_full), atol=1e-4)

    # and shallow_forward must still track the CURRENT sample through the
    # recomputed highest-resolution level
    out_track = shallow(params, x * 0.5, t, ctx, deep, down)
    assert not np.allclose(np.asarray(out_track), np.asarray(out_shallow), atol=1e-4)


def test_shallow_forward_rejects_controlnet_mode(tiny_controlnet):
    cn, params = tiny_controlnet
    with pytest.raises(ValueError, match="shallow_forward"):
        cn.apply(
            params, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 7, 24)), jnp.zeros((1, 16, 16, 64)),
            method="shallow_forward",
        )


def test_cond_embedding_conv_stack(rng):
    cn = SD15UNet(TINY, controlnet_mode=True, attn_impl="xla")
    cond = jnp.asarray(rng.standard_normal((1, 128, 128, 3), dtype=np.float32))
    params = cn.init(jax.random.key(2), cond, method="embed_cond")
    emb = cn.apply(params, cond, method="embed_cond")
    # one stride-2 per channel jump: 128 → 64; zero-init output conv → zeros
    assert emb.shape == (1, 64, 64, 32)
    assert np.abs(np.asarray(emb)).max() == 0.0


def test_lora_init_and_merge(tiny_unet):
    unet, params = tiny_unet
    trunk = split_trunk_params(params["params"])
    lora = init_lora_params(jax.random.key(3), trunk, rank=4)
    flat = porting.flatten(lora)
    # every targeted kernel got down+up; at least attn + ff + time emb
    downs = [k for k in flat if k.endswith("down")]
    assert any("to_q" in k for k in downs)
    assert any("proj_in" in k and "ff" in k for k in downs)
    assert any("time_emb_proj" in k for k in downs)
    assert any("time_embedding" in k for k in downs)
    # no conv kernels targeted
    for k in downs:
        assert "conv" not in k.split(".")[-3], k

    # up is zero-init → merge is identity at init
    merged = merge_lora(trunk, lora)
    for (p1, v1), (p2, v2) in zip(
        sorted(porting.flatten(trunk).items()), sorted(porting.flatten(merged).items())
    ):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))

    # non-zero up changes exactly the targeted kernels, nothing else
    lora2 = jax.tree.map(lambda x: x + 0.1, lora)
    merged2 = porting.flatten(merge_lora(trunk, lora2))
    base = porting.flatten(trunk)
    changed = {k for k in merged2 if not np.array_equal(merged2[k], base[k])}
    targeted = {k[: -len(".down")] for k in downs}
    assert changed == targeted


def test_controllora_weight_tying(tiny_unet, tiny_controlnet, rng):
    """ControlLoRA branch = UNet trunk params + zero lora + own heads.
    With identical trunks, the branch trunk output must equal the UNet's
    internal trunk — verified by comparing against a ControlNet given the
    unet's trunk directly."""
    unet, uparams = tiny_unet
    cn, cparams = tiny_controlnet
    heads = {
        k: v for k, v in cparams["params"].items() if k.startswith("controlnet_")
    }
    lora = init_lora_params(jax.random.key(4), split_trunk_params(uparams["params"]), 4)
    branch = controllora_params(uparams["params"], lora, heads)

    x = jnp.asarray(rng.standard_normal((1, 16, 16, 4), dtype=np.float32))
    t = jnp.array([7], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, 24), dtype=np.float32))
    emb = jnp.zeros((1, 16, 16, 32))
    down, mid = cn.apply({"params": branch}, x, t, ctx, emb, method="controlnet_forward")
    assert len(down) == 4  # runs with tied params

    # tied trunk: conv_in kernels are the same array object (zero-copy tie)
    assert branch["conv_in"]["kernel"] is uparams["params"]["conv_in"]["kernel"]


def test_param_counts_match_diffusers():
    unet = SD15UNet()
    x = jnp.zeros((1, 64, 64, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    shapes = jax.eval_shape(unet.init, jax.random.key(0), x, t, ctx)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(shapes))
    assert n == 859_520_964  # diffusers UNet2DConditionModel (SD1.5)

    cn = SD15UNet(controlnet_mode=True)
    emb = jnp.zeros((1, 64, 64, 320))
    sh1 = jax.eval_shape(
        lambda r: cn.init(r, x, t, ctx, emb, method="controlnet_forward"),
        jax.random.key(0),
    )
    cond = jnp.zeros((1, 512, 512, 3))
    sh2 = jax.eval_shape(lambda r: cn.init(r, cond, method="embed_cond"), jax.random.key(0))
    n1 = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(sh1))
    n2 = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(sh2))
    assert n1 + n2 == 361_279_120  # diffusers ControlNetModel (SD1.5)
