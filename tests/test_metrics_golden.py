"""SSIM/PSNR metrics (vs analytic expectations + noise monotonicity) and
the golden-tensor harness round trip."""

import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.utils.golden import GoldenSuite, save_goldens
from edgestyle_tpu.utils.metrics import mae, psnr, ssim


def test_ssim_identity_and_noise(rng):
    a = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    s_same = np.asarray(ssim(a, a))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)

    n1 = a + 0.01 * jnp.asarray(rng.standard_normal(a.shape), jnp.float32)
    n2 = a + 0.10 * jnp.asarray(rng.standard_normal(a.shape), jnp.float32)
    s1, s2 = float(ssim(a, n1)[0]), float(ssim(a, n2)[0])
    assert s1 > s2
    assert s1 > 0.99 and s2 < 0.98


def test_psnr_mae(rng):
    a = jnp.zeros((1, 8, 8, 1))
    b = jnp.full((1, 8, 8, 1), 0.1)
    np.testing.assert_allclose(np.asarray(psnr(a, b)), 20.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(mae(a, b)), 0.1, atol=1e-6)


def test_golden_suite(tmp_path, rng):
    ref_nchw = rng.standard_normal((1, 3, 8, 8)).astype(np.float32)
    p = save_goldens(str(tmp_path / "g.npz"), {"layer.out": ref_nchw, "vec": np.ones(4)})
    suite = GoldenSuite(p)
    ours = np.transpose(ref_nchw, (0, 2, 3, 1))
    r = suite.check("layer.out", ours + 1e-6, atol=1e-4)
    assert r.passed
    r2 = suite.check("vec", np.ones(4) + 1.0, atol=1e-4)
    assert not r2.passed
    rep = suite.report()
    assert "1/2 passed" in rep
    assert not suite.all_passed
