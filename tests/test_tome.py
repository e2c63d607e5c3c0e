"""ToMe token merging (ops/tome.py): merge/unmerge algebra, UNet
integration (param-free, opt-in), and pipeline plumbing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgestyle_tpu.ops.tome import ToMeConfig, build_merge


def test_merge_shapes_and_finiteness(rng):
    b, h, w, c = 2, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((b, h * w, c)), jnp.float32)
    merge, unmerge, r = build_merge(x, h, w, 32)
    assert r == 32
    y = merge(x)
    assert y.shape == (b, h * w - 32, c)
    z = unmerge(y)
    assert z.shape == x.shape and bool(jnp.isfinite(z).all())


def test_merge_identical_tokens_roundtrip_exact(rng):
    """All tokens equal → merging loses nothing; unmerge(merge(x)) == x."""
    b, h, w, c = 1, 8, 8, 12
    tok = jnp.asarray(rng.standard_normal((b, 1, c)), jnp.float32)
    x = jnp.broadcast_to(tok, (b, h * w, c))
    merge, unmerge, _ = build_merge(x, h, w, 40)
    np.testing.assert_allclose(
        np.asarray(unmerge(merge(x))), np.asarray(x), rtol=1e-5, atol=1e-5
    )


def test_merge_r0_is_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    merge, unmerge, r = build_merge(x, 4, 4, 0)
    assert r == 0 and merge(x) is x and unmerge(x) is x


def test_merge_caps_r_at_src_count(rng):
    # 4x4 grid with 2x2 dst stride: 4 dst, 12 src — r requests beyond 12 clip
    x = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    merge, unmerge, r = build_merge(x, 4, 4, 99)
    assert r == 12
    assert merge(x).shape == (1, 4, 4)  # only the dst tokens survive


def test_merge_mean_semantics():
    """A src token identical to a dst merges into it as the pair mean and
    unmerges as that mean at both positions."""
    h = w = 2  # dst = flat idx 0; src = 1, 2, 3
    c = 4
    d0 = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    far = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])
    far2 = jnp.asarray([[0.0, 0.0, 1.0, 0.0]])
    x = jnp.stack([d0[0], d0[0] * 3.0, far[0], far2[0]])[None]  # (1,4,c)
    # metric: src 1 is colinear with dst 0 (cos=1); srcs 2/3 orthogonal
    merge, unmerge, r = build_merge(x, h, w, 1)
    assert r == 1
    y = merge(x)  # kept srcs (2) + dst (1)
    assert y.shape == (1, 3, c)
    merged_dst = np.asarray(y[0, -1])
    np.testing.assert_allclose(merged_dst, np.asarray((d0[0] + d0[0] * 3) / 2))
    z = np.asarray(unmerge(y))[0]
    np.testing.assert_allclose(z[0], merged_dst)  # dst position
    np.testing.assert_allclose(z[1], merged_dst)  # merged src position
    np.testing.assert_allclose(z[2], np.asarray(far[0]))
    np.testing.assert_allclose(z[3], np.asarray(far2[0]))


def test_unet_tome_param_free_and_runs(rng):
    from tests.test_unet import TINY
    from edgestyle_tpu.models.unet import SD15UNet

    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, TINY.cross_attention_dim)),
                      jnp.float32)

    exact = SD15UNet(TINY, attn_impl="xla")
    params = jax.jit(exact.init)(jax.random.key(0), lat, t, ctx)["params"]
    merged = SD15UNet(TINY, attn_impl="xla",
                      tome=ToMeConfig(ratio=0.5, min_tokens=64))

    # same param tree: ToMe is purely functional (checkpoints unaffected)
    p2 = jax.jit(merged.init)(jax.random.key(0), lat, t, ctx)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)

    a = exact.apply({"params": params}, lat, t, ctx)
    b = merged.apply({"params": params}, lat, t, ctx)
    assert a.shape == b.shape and bool(jnp.isfinite(b).all())
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    # the approximation stays close on smooth random inputs
    corr = np.corrcoef(np.asarray(a).ravel(), np.asarray(b).ravel())[0, 1]
    assert corr > 0.9, corr

    # below min_tokens nothing merges — byte-identical
    off = SD15UNet(TINY, attn_impl="xla",
                   tome=ToMeConfig(ratio=0.5, min_tokens=10_000))
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(off.apply({"params": params}, lat, t, ctx))
    )


def test_pipeline_tome_plumbing(rng, monkeypatch):
    from tests.test_pipeline import TINY_PIPE, _inputs
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline

    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla",
                             tome=ToMeConfig(ratio=0.5, min_tokens=64))
    params = pipe.init_params(jax.random.key(0))
    ids, neg, imgs = _inputs(rng)
    out = pipe(params, ids, neg, imgs, num_inference_steps=2)
    o = np.asarray(out)
    assert o.shape == (1, 32, 32, 3) and np.isfinite(o).all()

    exact = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    base = np.asarray(exact(params, ids, neg, imgs, num_inference_steps=2))
    assert not np.array_equal(o, base)

    # bare-ratio and env-var forms build the same config
    assert EdgeStylePipeline(TINY_PIPE, tome=0.25).tome == ToMeConfig(ratio=0.25)
    monkeypatch.setenv("EDGESTYLE_TOME", "0.5")
    monkeypatch.setenv("EDGESTYLE_TOME_MIN", "256")
    monkeypatch.setenv("EDGESTYLE_TOME_MLP", "1")
    p = EdgeStylePipeline(TINY_PIPE)
    assert p.tome == ToMeConfig(ratio=0.5, min_tokens=256, merge_mlp=True)
    monkeypatch.setenv("EDGESTYLE_TOME", "0")
    assert EdgeStylePipeline(TINY_PIPE).tome is None
    with pytest.raises(ValueError, match="tome"):
        EdgeStylePipeline(TINY_PIPE, tome="half")


def test_export_cli_bakes_tome(tmp_path):
    """--tome bakes the merged-attention denoise graph into the artifact
    (reference export_onnx.py analog with the opt-in lever applied)."""
    from edgestyle_tpu.apps.export import main
    from tests.test_pipeline import TINY_PIPE

    report = main(
        ["--output_dir", str(tmp_path), "--random_init",
         "--what", "unet_controlnet", "--dtype", "float32",
         "--tome", "0.5"],
        config=TINY_PIPE,
    )
    assert (tmp_path / "unet_controlnet.stablehlo").exists()
    assert report["unet_controlnet"]["flops"] > 0
