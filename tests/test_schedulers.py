"""Scheduler tests.

With no diffusers in the image, UniPC/DDIM are validated against an
*analytic* diffusion: for Gaussian data x0 ~ N(mu, s²), the exact
ε-predictor is closed-form and the probability-flow ODE solution is
x(t) = √ᾱ_t·mu + √(ᾱ_t·s² + 1-ᾱ_t)·z — so the solver's output at t=0 can
be compared against exact ground truth, and its order measured.
"""

import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.schedulers.ddpm import (
    NoiseSchedule,
    add_noise,
    compute_snr,
    get_velocity,
)
from edgestyle_tpu.schedulers.ddim import DDIMScheduler
from edgestyle_tpu.schedulers.unipc import UniPCScheduler

MU, S = 0.7, 0.35


def exact_eps(sched: NoiseSchedule):
    def eps(x, t):
        ac = sched.alphas_cumprod[t]
        a, sig = jnp.sqrt(ac), jnp.sqrt(1 - ac)
        # E[x0|x_t] for Gaussian prior N(MU, S^2)
        x0_hat = (a * S**2 * x + sig**2 * MU) / (a**2 * S**2 + sig**2)
        return (x - a * x0_hat) / sig

    return eps


def exact_solution(sched, xT, tT):
    ac = sched.alphas_cumprod[tT]
    z = (xT - jnp.sqrt(ac) * MU) / jnp.sqrt(ac * S**2 + (1 - ac))
    return MU + S * z


def test_add_noise_and_velocity():
    sched = NoiseSchedule.sd15()
    x0 = jnp.ones((2, 4, 4, 1)) * 0.5
    noise = jnp.ones_like(x0)
    t = jnp.array([0, 999])
    xt = add_noise(sched, x0, noise, t)
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(
        np.asarray(xt[0]).ravel()[0], 0.5 * ac[0] ** 0.5 + (1 - ac[0]) ** 0.5, rtol=1e-6
    )
    v = get_velocity(sched, x0, noise, t)
    np.testing.assert_allclose(
        np.asarray(v[1]).ravel()[0], ac[999] ** 0.5 - (1 - ac[999]) ** 0.5 * 0.5, rtol=1e-5
    )
    snr = compute_snr(sched, t)
    assert snr[0] > 1e3 and snr[1] < 1e-2


def _eps_continuous(x, alpha, sigma):
    """Closed-form ε-predictor for the Gaussian toy in (α, σ) parameters."""
    x0_hat = (alpha * S**2 * x + sigma**2 * MU) / (alpha**2 * S**2 + sigma**2)
    return (x - alpha * x0_hat) / sigma


def _rk4_reference(sched, xT, ts_first, ts_last, n_fine=4000):
    """High-accuracy PF-ODE solve in λ-space (DPM exact integral form:
    d(x/α)/dλ = -e^{-λ}·ε) from t_first to t_last, then the same
    final-sigma-zero jump UniPC takes (x → x0_hat at t_last).

    The jump E[x0|x_t_last] ≠ ODE endpoint is a deliberate modelling bias of
    final_sigmas_type="zero"; baking the identical jump into the reference
    makes the comparison measure solver error only."""
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    lam = lambda t: 0.5 * (np.log(ac[t]) - np.log(1 - ac[t]))
    l0, l1 = lam(ts_first), lam(ts_last)

    def deriv(xhat, l):
        alpha = (1.0 / (1.0 + np.exp(-2 * l))) ** 0.5
        sigma = (1.0 - alpha**2) ** 0.5
        x = alpha * xhat
        return -np.exp(-l) * np.asarray(_eps_continuous(x, alpha, sigma))

    h = (l1 - l0) / n_fine
    xhat = np.asarray(xT, np.float64) / ac[ts_first] ** 0.5
    l = l0
    for _ in range(n_fine):
        k1 = deriv(xhat, l)
        k2 = deriv(xhat + 0.5 * h * k1, l + 0.5 * h)
        k3 = deriv(xhat + 0.5 * h * k2, l + 0.5 * h)
        k4 = deriv(xhat + h * k3, l + h)
        xhat = xhat + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
        l += h
    x_last = ac[ts_last] ** 0.5 * xhat
    a, s = ac[ts_last] ** 0.5, (1 - ac[ts_last]) ** 0.5
    x0_hat = (a * S**2 * x_last + s**2 * MU) / (a**2 * S**2 + s**2)
    return x0_hat


def _run_unipc(num_steps, order=2):
    sched = NoiseSchedule.sd15()
    sch = UniPCScheduler(sched, solver_order=order)
    plan = sch.plan(num_steps)
    eps = exact_eps(sched)
    xT = jnp.asarray(np.random.default_rng(3).standard_normal((8, 1)), jnp.float32)
    final = jax.jit(lambda xT: sch.sample_loop(plan, eps, xT))(xT)
    ts = np.asarray(plan.timesteps)
    ref = _rk4_reference(sched, np.asarray(xT), int(ts[0]), int(ts[-1]))
    return float(np.max(np.abs(np.asarray(final, np.float64) - ref)))


def test_unipc_matches_fine_ode_solution():
    err20 = _run_unipc(20)
    assert err20 < 2e-3, err20


def _mid_traj_err(num_steps, t_cut=450, order=2):
    """Global error at the first grid point below t_cut, vs segmentwise RK4.

    Fixing the measurement point (rather than t=0, whose distance-to-zero
    shrinks with N and adds stiffness) isolates the solver's own order."""
    sched = NoiseSchedule.sd15()
    sch = UniPCScheduler(sched, solver_order=order)
    plan = sch.plan(num_steps)
    ts = np.asarray(plan.timesteps)
    eps = exact_eps(sched)
    xT = jnp.asarray(np.random.default_rng(3).standard_normal((8, 1)), jnp.float32)

    state = sch.init_state(xT.shape, xT.dtype)
    x, ref = xT, np.asarray(xT, np.float64)
    step = jax.jit(lambda i, mo, x, st: sch.step(plan, i, mo, x, st))
    for i in range(num_steps - 1):
        x, state = step(i, eps(x, int(ts[i])), x, state)
        ref = _rk4_segment(sched, ref, int(ts[i]), int(ts[i + 1]))
        if ts[i + 1] < t_cut:
            return float(np.max(np.abs(np.asarray(x, np.float64) - ref)))
    raise AssertionError("t_cut not reached")


def _rk4_segment(sched, x0, t0, t1, n_fine=800):
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    lam = lambda t: 0.5 * (np.log(ac[t]) - np.log(1 - ac[t]))
    l0, l1 = lam(t0), lam(t1)

    def deriv(xhat, l):
        a = (1.0 / (1.0 + np.exp(-2 * l))) ** 0.5
        s = (1.0 - a * a) ** 0.5
        return -np.exp(-l) * np.asarray(_eps_continuous(a * xhat, a, s))

    h = (l1 - l0) / n_fine
    xh, l = np.asarray(x0) / ac[t0] ** 0.5, l0
    for _ in range(n_fine):
        k1 = deriv(xh, l)
        k2 = deriv(xh + 0.5 * h * k1, l + 0.5 * h)
        k3 = deriv(xh + 0.5 * h * k2, l + 0.5 * h)
        k4 = deriv(xh + h * k3, l + h)
        xh = xh + (h / 6) * (k1 + 2 * k2 + 2 * k3 + k4)
        l += h
    return ac[t1] ** 0.5 * xh


def test_unipc_converges_superlinearly_mid_trajectory():
    errs = [_mid_traj_err(n) for n in (10, 20, 40)]
    assert errs[1] < errs[0] / 2.5, errs
    assert errs[2] < errs[1] / 2.5, errs
    assert errs[2] < 1e-4, errs


def test_unipc_beats_first_order_at_equal_steps():
    e2 = _run_unipc(20, order=2)
    e1 = _run_unipc(20, order=1)
    assert e2 < e1 / 3, (e2, e1)


def test_unipc_order1_is_stable():
    err = _run_unipc(20, order=1)
    assert err < 0.05


def test_ddim_first_order_convergence_to_analytic_map():
    # DDIM is 1st-order; error vs the analytic PF-ODE map should shrink
    # roughly linearly in step count (endpoint t=0 bias ~1e-3 remains).
    sched = NoiseSchedule.sd15()
    eps = exact_eps(sched)
    errs = []
    for N in (50, 200):
        xT = jnp.asarray(np.random.default_rng(5).standard_normal((4, 1)), jnp.float32)
        ddim = DDIMScheduler(sched)
        ts = np.asarray(ddim.timesteps(N, spacing="linspace"))
        x = xT
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            x = ddim.step(eps(x, int(t)), int(t), int(t_prev), x)
        errs.append(float(jnp.max(jnp.abs(x - exact_solution(sched, xT, int(ts[0]))))))
    assert errs[1] < errs[0] / 2, errs
    assert errs[1] < 0.02, errs


def test_v_prediction_roundtrip():
    """to_x0(v) must invert get_velocity: for x_t = a·x0 + s·ε and
    v = a·ε − s·x0, a·x_t − s·v == x0 exactly."""
    import dataclasses as _dc

    from edgestyle_tpu.schedulers.ddpm import add_noise, get_velocity, training_target
    from edgestyle_tpu.schedulers.unipc import UniPCScheduler

    sched = _dc.replace(NoiseSchedule.sd15(), prediction_type="v_prediction")
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 1)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 4, 4, 1)), jnp.float32)
    t = jnp.array([100, 700])
    xt = add_noise(sched, x0, eps, t)
    v = get_velocity(sched, x0, eps, t)
    np.testing.assert_array_equal(np.asarray(training_target(sched, x0, eps, t)),
                                  np.asarray(v))
    sch = UniPCScheduler(sched)
    # to_x0 operates per-sample scalar t; check both entries
    for i in range(2):
        rec = sch.to_x0(v[i], xt[i], t[i])
        np.testing.assert_allclose(np.asarray(rec), np.asarray(x0[i]), atol=1e-5)


def test_ddim_v_prediction_step_consistency():
    """A DDIM step fed perfectly consistent (x_t, v) must land exactly on
    the x0/ε decomposition at the previous timestep."""
    import dataclasses as _dc

    from edgestyle_tpu.schedulers.ddpm import add_noise, get_velocity

    sched = _dc.replace(NoiseSchedule.sd15(), prediction_type="v_prediction")
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.standard_normal((1, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4)), jnp.float32)
    t, t_prev = 500, 400
    xt = add_noise(sched, x0, eps, jnp.array([t]))
    v = get_velocity(sched, x0, eps, jnp.array([t]))
    ddim = DDIMScheduler(sched)
    out = ddim.step(v, t, t_prev, xt)
    expect = add_noise(sched, x0, eps, jnp.array([t_prev]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-5)


def test_unipc_single_step_plan():
    """steps=1 must degenerate cleanly: order 1, no corrector, finite output."""
    sched = NoiseSchedule.sd15()
    sch = UniPCScheduler(sched)
    plan = sch.plan(1)
    assert plan.num_steps == 1
    assert int(plan.pred_order[0]) == 1
    assert not bool(plan.use_corrector[0])
    eps = exact_eps(sched)
    xT = jnp.asarray(np.random.default_rng(0).standard_normal((4, 1)), jnp.float32)
    out = jax.jit(lambda x: sch.sample_loop(plan, eps, x))(xT)
    assert np.isfinite(np.asarray(out)).all()
