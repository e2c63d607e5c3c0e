"""North-star program test: photos + keypoints → try-on image in ONE jitted
call, and vmap-ability over a leading batch axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgestyle_tpu.models.efficientvit.sam import SamConfig
from edgestyle_tpu.pipelines.full import FusedTryOn
from edgestyle_tpu.pipelines.preprocess import TryOnPreprocessor
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline
from tests.test_efficientvit import TINY_BB
from tests.test_pipeline import TINY_PIPE


@pytest.mark.heavy
def test_fused_photos_to_tryon(rng):
    preproc = TryOnPreprocessor(SamConfig(backbone=TINY_BB, neck_depth=1, image_size=32))
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    fused = FusedTryOn(preproc, pipe)

    params = {
        **preproc.init_params(jax.random.key(0)),
        "gen": pipe.init_params(jax.random.key(1)),
    }
    photos = [jnp.asarray(rng.random((32, 32, 3)), jnp.float32) for _ in range(3)]
    kps = np.full((3, 18, 2), np.nan, np.float32)
    kps[:, :6] = rng.random((3, 6, 2)) * 32
    ids = jnp.zeros((1, 7), jnp.int32)

    out = fused(params, photos[0], photos[1], photos[2], jnp.asarray(kps),
                ids, ids, jax.random.key(2), num_inference_steps=2)
    assert out.shape == (1, 32, 32, 3)
    o = np.asarray(out)
    assert np.isfinite(o).all() and 0.0 <= o.min() and o.max() <= 1.0

    # determinism of the single program
    out2 = fused(params, photos[0], photos[1], photos[2], jnp.asarray(kps),
                 ids, ids, jax.random.key(2), num_inference_steps=2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.heavy
def test_fused_tryon_matches_committed_golden():
    """VERDICT r3 item 7: the committed photos→try-on golden
    (tests/goldens/fused_tryon_v1.npz, captured by
    scripts/capture_fused_golden.py) must be reproduced every suite run —
    the machine-visible analog of the reference's committed
    docs/test/result.jpg + test_inference.sh smoke test."""
    import os

    import pytest

    from tests.fused_golden import GOLDEN_NPZ, run_fused

    if not os.path.exists(GOLDEN_NPZ):
        pytest.skip("golden missing — run scripts/capture_fused_golden.py")
    want = np.load(GOLDEN_NPZ)["tryon"]
    got = run_fused()
    assert got.shape == want.shape
    # same backend/precision as capture (conftest pins cpu + highest);
    # tolerance covers XLA version-to-version fusion-order rounding only
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
