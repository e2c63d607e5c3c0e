"""Shared fixture for the COMMITTED fused-tryon end-to-end golden
(VERDICT r3 item 7): a fully seeded tiny photos→try-on program whose
output tensor is captured once (scripts/capture_fused_golden.py →
tests/goldens/fused_tryon_v1.npz) and re-checked every suite run, so any
photos→image drift — preprocessing, masks, pose render, generation,
decode — is machine-visible round over round. The reference pins exactly
this with its committed docs/test/result.jpg + test_inference.sh:1-17.
"""

import os

import numpy as np

GOLDEN_NPZ = os.path.join(os.path.dirname(__file__), "goldens",
                          "fused_tryon_v1.npz")


def build_fused():
    """The tiny fused program + seeded params/inputs (deterministic)."""
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.models.efficientvit.sam import SamConfig
    from edgestyle_tpu.pipelines.full import FusedTryOn
    from edgestyle_tpu.pipelines.preprocess import TryOnPreprocessor
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline
    from tests.test_efficientvit import TINY_BB
    from tests.test_pipeline import TINY_PIPE

    preproc = TryOnPreprocessor(
        SamConfig(backbone=TINY_BB, neck_depth=1, image_size=32)
    )
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    fused = FusedTryOn(preproc, pipe)
    params = {
        **preproc.init_params(jax.random.key(0)),
        "gen": pipe.init_params(jax.random.key(1)),
    }
    g = np.random.default_rng(1234)
    # synthetic "photos": smooth color fields + a bright subject blob so
    # the SAM/pose path sees structure, values in [0, 1]
    def photo(seed):
        gg = np.random.default_rng(seed)
        base = gg.random((32, 32, 3)).astype(np.float32)
        y, x = np.mgrid[0:32, 0:32]
        blob = np.exp(-(((y - 16) ** 2 + (x - 16) ** 2) / 60.0))
        return jnp.asarray(
            np.clip(base * 0.5 + blob[..., None] * 0.5, 0, 1), jnp.float32
        )

    kps = np.full((3, 18, 2), np.nan, np.float32)
    kps[:, :8] = g.random((3, 8, 2)).astype(np.float32) * 28 + 2
    ids = jnp.asarray(g.integers(1, 99, (1, 7)), jnp.int32)
    neg = jnp.asarray(g.integers(1, 99, (1, 7)), jnp.int32)
    inputs = dict(
        subject=photo(10), clothes1=photo(11), clothes2=photo(12),
        kps=jnp.asarray(kps), ids=ids, neg=neg,
        rng=jax.random.key(77), num_inference_steps=3,
    )
    return fused, params, inputs


def run_fused():
    fused, params, i = build_fused()
    out = fused(params, i["subject"], i["clothes1"], i["clothes2"],
                i["kps"], i["ids"], i["neg"], i["rng"],
                num_inference_steps=i["num_inference_steps"])
    return np.asarray(out, np.float32)
