"""Trajectory parity vs hand-transcribed reference implementations
(VERDICT r1 item 5: UniPC was validated only against an RK4 PF-ODE and
Prodigy only on analytic problems — neither against the actual code the
reference runs).

DiffusersUniPCRef transcribes diffusers' UniPCMultistepScheduler
(scheduling_unipc_multistep.py: predict_x0=True, solver_type='bh2',
lower_order_final=True, final_sigmas_type='zero',
timestep_spacing='linspace', epsilon prediction — the config
EdgeStyle runs via UniPCMultistepScheduler.from_config, reference
app.py:118) in float64 numpy with the original's dynamic control flow.

ProdigyRef transcribes prodigyopt.Prodigy.step (the exact optimizer the
reference constructs at train...py:931-948: betas (0.9,0.999),
beta3=None, decouple=True, use_bias_correction=True,
safeguard_warmup=True, wd=1e-4, eps=1e-8, lr=1.0).

These pin order/warmup off-by-ones and d-estimate semantics that the
self-referential tests could not catch.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
from edgestyle_tpu.schedulers.unipc import UniPCScheduler


# ===================================================== diffusers UniPC ref
class DiffusersUniPCRef:
    def __init__(self, alphas_cumprod, solver_order=2):
        self.ac = np.asarray(alphas_cumprod, np.float64)
        self.T = len(self.ac)
        self.order = solver_order

    # -- scheduling_unipc_multistep.set_timesteps (linspace + zero final)
    def set_timesteps(self, n):
        self.n = n
        self.timesteps = (
            np.linspace(0, self.T - 1, n + 1).round()[::-1][:-1].astype(np.int64)
        )
        sig = np.sqrt((1.0 - self.ac) / self.ac)
        self.sigmas = np.concatenate([sig[self.timesteps], [0.0]])
        self.model_outputs = [None] * self.order
        self.lower_order_nums = 0
        self.last_sample = None
        self.this_order = None
        self.step_index = 0

    @staticmethod
    def _alpha_sigma(sigma):
        alpha = 1.0 / np.sqrt(1.0 + sigma**2)
        return alpha, sigma * alpha

    def _lambda(self, sigma):
        a, s = self._alpha_sigma(sigma)
        with np.errstate(divide="ignore"):
            return np.log(a) - np.log(s)

    def _convert(self, eps, sample, i):
        a, s = self._alpha_sigma(self.sigmas[i])
        return (sample - s * eps) / a

    def _Rb(self, rks, hh, order):
        R, b = [], []
        h_phi_k = np.expm1(hh) / hh - 1.0
        B_h = np.expm1(hh)
        factorial_i = 1.0
        for k in range(1, order + 1):
            R.append(np.power(rks, k - 1))
            b.append(h_phi_k * factorial_i / B_h)
            factorial_i *= k + 1
            h_phi_k = h_phi_k / hh - 1.0 / factorial_i
        return np.stack(R), np.array(b), B_h

    def _uni_p(self, sample, order, i):
        alpha_t, sigma_t = self._alpha_sigma(self.sigmas[i + 1])
        _, sigma_s0 = self._alpha_sigma(self.sigmas[i])
        lambda_t, lambda_s0 = self._lambda(self.sigmas[i + 1]), self._lambda(self.sigmas[i])
        m0 = self.model_outputs[-1]
        h = lambda_t - lambda_s0
        rks, D1s = [], []
        for k in range(1, order):
            lambda_sk = self._lambda(self.sigmas[i - k])
            mk = self.model_outputs[-(k + 1)]
            rk = (lambda_sk - lambda_s0) / h
            rks.append(rk)
            D1s.append((mk - m0) / rk)
        rks.append(1.0)
        rks = np.array(rks)
        hh = -h
        h_phi_1 = np.expm1(hh)
        R, b, B_h = self._Rb(rks, hh, order)
        if D1s:
            D1s_arr = np.stack(D1s)
            if order == 2:
                rhos_p = np.array([0.5])
            else:
                rhos_p = np.linalg.solve(R[:-1, :-1], b[:-1])
            pred = np.tensordot(rhos_p, D1s_arr, axes=1)
        else:
            pred = 0.0
        x_t_ = sigma_t / sigma_s0 * sample - alpha_t * h_phi_1 * m0
        return x_t_ - alpha_t * B_h * pred

    def _uni_c(self, this_x0, last_sample, order, i):
        alpha_t, sigma_t = self._alpha_sigma(self.sigmas[i])
        _, sigma_s0 = self._alpha_sigma(self.sigmas[i - 1])
        lambda_t, lambda_s0 = self._lambda(self.sigmas[i]), self._lambda(self.sigmas[i - 1])
        m0 = self.model_outputs[-1]  # x0_{i-1}, pre-shift
        h = lambda_t - lambda_s0
        rks, D1s = [], []
        for k in range(1, order):
            lambda_sk = self._lambda(self.sigmas[i - 1 - k])
            mk = self.model_outputs[-(k + 1)]
            rk = (lambda_sk - lambda_s0) / h
            rks.append(rk)
            D1s.append((mk - m0) / rk)
        rks.append(1.0)
        rks = np.array(rks)
        hh = -h
        h_phi_1 = np.expm1(hh)
        R, b, B_h = self._Rb(rks, hh, order)
        if order == 1:
            rhos_c = np.array([0.5])
        else:
            rhos_c = np.linalg.solve(R, b)
        corr = np.tensordot(rhos_c[:-1], np.stack(D1s), axes=1) if D1s else 0.0
        D1_t = this_x0 - m0
        x_t_ = sigma_t / sigma_s0 * last_sample - alpha_t * h_phi_1 * m0
        return x_t_ - alpha_t * B_h * (corr + rhos_c[-1] * D1_t)

    def step(self, eps, sample):
        i = self.step_index
        x0 = self._convert(eps, sample, i)
        if i > 0 and self.last_sample is not None:
            sample = self._uni_c(x0, self.last_sample, self.this_order, i)
        self.model_outputs = self.model_outputs[1:] + [x0]
        this_order = min(self.order, self.n - i)  # lower_order_final
        this_order = min(this_order, self.lower_order_nums + 1)
        self.this_order = this_order
        self.last_sample = sample
        prev = self._uni_p(sample, this_order, i)
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev


def _toy_eps(x, t):
    """Deterministic pseudo-model: smooth in x and t, identical math for
    the fp64 numpy reference and the fp32 jitted scan."""
    return 0.9 * x * np.cos(t / 311.0) + 0.1


@pytest.mark.parametrize("num_steps,order", [(20, 2), (7, 2), (20, 3), (5, 1)])
def test_unipc_matches_diffusers_transcription(num_steps, order):
    sched = NoiseSchedule.sd15()
    ours = UniPCScheduler(sched, solver_order=order)
    plan = ours.plan(num_steps)

    ref = DiffusersUniPCRef(np.asarray(sched.alphas_cumprod), solver_order=order)
    ref.set_timesteps(num_steps)
    np.testing.assert_array_equal(np.asarray(plan.timesteps), ref.timesteps)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 4, 4))

    # reference trajectory (fp64, dynamic control flow)
    xr = x.copy()
    for i in range(num_steps):
        eps = _toy_eps(xr, float(ref.timesteps[i]))
        xr = ref.step(eps, xr)

    # ours (fp32, lax.scan)
    def model_fn(sample, t):
        return 0.9 * sample * jnp.cos(t.astype(jnp.float32) / 311.0) + 0.1

    final = jax.jit(
        lambda x0: ours.sample_loop(plan, model_fn, x0)
    )(jnp.asarray(x, jnp.float32))

    np.testing.assert_allclose(
        np.asarray(final), xr, rtol=2e-4, atol=2e-4,
    )


# ============================================ diffusers DPM-Solver++ ref
class DiffusersDPMRef:
    """diffusers scheduling_dpmsolver_multistep.py transcribed to float64
    numpy with the original's dynamic control flow (algorithm_type
    'dpmsolver++', timestep_spacing 'linspace', final_sigmas_type 'zero',
    lower_order_final=True, epsilon prediction)."""

    def __init__(self, alphas_cumprod, solver_order=2, solver_type="midpoint"):
        self.ac = np.asarray(alphas_cumprod, np.float64)
        self.T = len(self.ac)
        self.order = solver_order
        self.solver_type = solver_type

    def set_timesteps(self, n):
        self.n = n
        self.timesteps = (
            np.linspace(0, self.T - 1, n + 1).round()[::-1][:-1].astype(np.int64)
        )
        sig = np.sqrt((1.0 - self.ac) / self.ac)
        self.sigmas = np.concatenate([sig[self.timesteps], [0.0]])
        self.model_outputs = [None] * self.order
        self.lower_order_nums = 0
        self.step_index = 0

    @staticmethod
    def _alpha_sigma(sigma):
        alpha = 1.0 / np.sqrt(1.0 + sigma**2)
        return alpha, sigma * alpha

    def _lambda(self, sigma):
        a, s = self._alpha_sigma(sigma)
        with np.errstate(divide="ignore"):
            return np.log(a) - np.log(s)

    def _convert(self, eps, sample, i):
        a, s = self._alpha_sigma(self.sigmas[i])
        return (sample - s * eps) / a

    # dpm_solver_first_order_update
    def _first(self, sample, i):
        alpha_t, sigma_t = self._alpha_sigma(self.sigmas[i + 1])
        _, sigma_s = self._alpha_sigma(self.sigmas[i])
        h = self._lambda(self.sigmas[i + 1]) - self._lambda(self.sigmas[i])
        m0 = self.model_outputs[-1]
        return (sigma_t / sigma_s) * sample - alpha_t * np.expm1(-h) * m0

    # multistep_dpm_solver_second_order_update
    def _second(self, sample, i):
        alpha_t, sigma_t = self._alpha_sigma(self.sigmas[i + 1])
        _, sigma_s0 = self._alpha_sigma(self.sigmas[i])
        lam_t = self._lambda(self.sigmas[i + 1])
        lam_s0 = self._lambda(self.sigmas[i])
        lam_s1 = self._lambda(self.sigmas[i - 1])
        m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
        h, h_0 = lam_t - lam_s0, lam_s0 - lam_s1
        r0 = h_0 / h
        D0, D1 = m0, (m0 - m1) / r0
        if self.solver_type == "midpoint":
            return (
                (sigma_t / sigma_s0) * sample
                - alpha_t * np.expm1(-h) * D0
                - 0.5 * alpha_t * np.expm1(-h) * D1
            )
        return (  # heun
            (sigma_t / sigma_s0) * sample
            - alpha_t * np.expm1(-h) * D0
            + alpha_t * (np.expm1(-h) / h + 1.0) * D1
        )

    # multistep_dpm_solver_third_order_update
    def _third(self, sample, i):
        alpha_t, sigma_t = self._alpha_sigma(self.sigmas[i + 1])
        _, sigma_s0 = self._alpha_sigma(self.sigmas[i])
        lam_t = self._lambda(self.sigmas[i + 1])
        lam_s0 = self._lambda(self.sigmas[i])
        lam_s1 = self._lambda(self.sigmas[i - 1])
        lam_s2 = self._lambda(self.sigmas[i - 2])
        m0, m1, m2 = (
            self.model_outputs[-1],
            self.model_outputs[-2],
            self.model_outputs[-3],
        )
        h, h_0, h_1 = lam_t - lam_s0, lam_s0 - lam_s1, lam_s1 - lam_s2
        r0, r1 = h_0 / h, h_1 / h
        D0 = m0
        D1_0, D1_1 = (m0 - m1) / r0, (m1 - m2) / r1
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (D1_0 - D1_1) / (r0 + r1)
        return (
            (sigma_t / sigma_s0) * sample
            - alpha_t * np.expm1(-h) * D0
            + alpha_t * (np.expm1(-h) / h + 1.0) * D1
            - alpha_t * ((np.expm1(-h) + h) / h**2 - 0.5) * D2
        )

    def step(self, eps, sample):
        i = self.step_index
        x0 = self._convert(eps, sample, i)
        self.model_outputs = self.model_outputs[1:] + [x0]
        lower_order_final = i == self.n - 1  # final_sigmas_type == "zero"
        lower_order_second = i == self.n - 2 and self.n < 15
        if self.order == 1 or self.lower_order_nums < 1 or lower_order_final:
            prev = self._first(sample, i)
        elif self.order == 2 or self.lower_order_nums < 2 or lower_order_second:
            prev = self._second(sample, i)
        else:
            prev = self._third(sample, i)
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev


@pytest.mark.parametrize("num_steps,order,solver_type", [
    (20, 2, "midpoint"),  # the SD-standard configuration
    (7, 2, "midpoint"),   # short run: the n<15 second-to-last cap engages
    (20, 3, "midpoint"),
    (5, 1, "midpoint"),
    (20, 2, "heun"),
])
def test_dpmsolver_matches_diffusers_transcription(num_steps, order, solver_type):
    from edgestyle_tpu.schedulers.dpmsolver import DPMSolverScheduler

    sched = NoiseSchedule.sd15()
    ours = DPMSolverScheduler(sched, solver_order=order, solver_type=solver_type)
    plan = ours.plan(num_steps)

    ref = DiffusersDPMRef(
        np.asarray(sched.alphas_cumprod), solver_order=order,
        solver_type=solver_type,
    )
    ref.set_timesteps(num_steps)
    np.testing.assert_array_equal(np.asarray(plan.timesteps), ref.timesteps)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 4, 4))

    xr = x.copy()
    for i in range(num_steps):
        eps = _toy_eps(xr, float(ref.timesteps[i]))
        xr = ref.step(eps, xr)

    def model_fn(sample, t):
        return 0.9 * sample * jnp.cos(t.astype(jnp.float32) / 311.0) + 0.1

    final = jax.jit(
        lambda x0: ours.sample_loop(plan, model_fn, x0)
    )(jnp.asarray(x, jnp.float32))

    np.testing.assert_allclose(np.asarray(final), xr, rtol=2e-4, atol=2e-4)


# ===================================================== prodigyopt ref
class ProdigyRef:
    """prodigyopt.Prodigy transcribed to numpy float32 (single param
    group, the configuration the reference passes)."""

    def __init__(self, params, lr=1.0, betas=(0.9, 0.999), beta3=None,
                 eps=1e-8, weight_decay=0.0, decouple=True,
                 use_bias_correction=True, safeguard_warmup=True,
                 d0=1e-6, d_coef=1.0, growth_rate=float("inf")):
        self.p = [np.array(p, np.float32) for p in params]
        self.p0 = [p.copy() for p in self.p]
        self.exp_avg = [np.zeros_like(p) for p in self.p]
        self.exp_avg_sq = [np.zeros_like(p) for p in self.p]
        self.s = [np.zeros_like(p) for p in self.p]
        self.lr, self.beta1, self.beta2 = lr, betas[0], betas[1]
        self.beta3 = beta3 if beta3 is not None else betas[1] ** 0.5
        self.eps, self.wd, self.decouple = eps, weight_decay, decouple
        self.bias_corr, self.safeguard = use_bias_correction, safeguard_warmup
        self.d = self.d0 = d0
        self.d_max, self.d_coef, self.growth = d0, d_coef, growth_rate
        self.d_numerator = 0.0
        self.k = 0

    def step(self, grads):
        d, lr, k = self.d, self.lr, self.k
        if self.bias_corr:
            bc = ((1 - self.beta2 ** (k + 1)) ** 0.5) / (1 - self.beta1 ** (k + 1))
        else:
            bc = 1.0
        dlr = d * lr * bc
        d_numerator = self.d_numerator * self.beta3
        d_denom = 0.0
        for i, g in enumerate(grads):
            g = np.asarray(g, np.float32)
            d_numerator += (d / self.d0) * dlr * float(
                np.dot(g.ravel(), (self.p0[i] - self.p[i]).ravel())
            )
            self.exp_avg[i] = self.beta1 * self.exp_avg[i] + d * (1 - self.beta1) * g
            self.exp_avg_sq[i] = (
                self.beta2 * self.exp_avg_sq[i] + d * d * (1 - self.beta2) * g * g
            )
            coef = (d / self.d0) * (d if self.safeguard else dlr)
            self.s[i] = self.beta3 * self.s[i] + coef * g
            d_denom += float(np.abs(self.s[i]).sum())
        if d_denom == 0.0:
            return
        if lr > 0.0:
            d_hat = self.d_coef * d_numerator / d_denom
            if self.d == self.d0:
                d = max(d, d_hat)
            self.d_max = max(self.d_max, d_hat)
            d = min(self.d_max, d * self.growth)
        self.d_numerator = d_numerator
        self.d = d  # NEW d: used by the eps term below; dlr keeps old d
        for i in range(len(self.p)):
            denom = np.sqrt(self.exp_avg_sq[i]) + d * self.eps
            if self.wd != 0.0 and self.decouple:
                self.p[i] = self.p[i] - self.wd * dlr * self.p[i]
            self.p[i] = self.p[i] - dlr * self.exp_avg[i] / denom
        self.k = k + 1


def _prodigy_problem():
    rng = np.random.default_rng(11)
    params = [rng.standard_normal((4, 3)).astype(np.float32),
              (rng.standard_normal(5) * 3).astype(np.float32)]
    targets = [rng.standard_normal((4, 3)).astype(np.float32) * 2,
               rng.standard_normal(5).astype(np.float32)]
    scales = [1.0, 40.0]  # ill-conditioned across tensors
    return params, targets, scales


@pytest.mark.parametrize("wd,safeguard,bias_corr", [
    (1e-4, True, True),    # the reference's exact configuration
    (0.0, False, False),   # prodigyopt defaults
])
def test_prodigy_matches_prodigyopt_transcription(wd, safeguard, bias_corr):
    import optax

    from edgestyle_tpu.training.prodigy import get_d, prodigy

    params, targets, scales = _prodigy_problem()

    def grad_of(ps):
        return [s * (np.asarray(p) - t) for p, t, s in zip(ps, targets, scales)]

    ref = ProdigyRef(params, weight_decay=wd, safeguard_warmup=safeguard,
                     use_bias_correction=bias_corr)

    opt = prodigy(learning_rate=1.0, weight_decay=wd,
                  safeguard_warmup=safeguard, use_bias_correction=bias_corr)
    jp = [jnp.asarray(p) for p in params]
    state = opt.init(jp)
    jt = [jnp.asarray(t) for t in targets]

    @jax.jit
    def step(ps, st):
        gs = [s * (p - t) for p, t, s in zip(ps, jt, scales)]
        upd, st2 = opt.update(gs, st, ps)
        return optax.apply_updates(ps, upd), st2

    for it in range(60):
        ref.step(grad_of(ref.p))
        jp, state = step(jp, state)
        if it in (0, 1, 5, 20, 59):
            for a, b in zip(jp, ref.p):
                np.testing.assert_allclose(np.asarray(a), b, rtol=2e-4,
                                           atol=2e-5, err_msg=f"step {it}")
            # d involves global Σ|s| reductions: the transcription
            # accumulates in python float64, ours in fp32 — allow 1e-3
            np.testing.assert_allclose(float(get_d(state)), ref.d, rtol=1e-3,
                                       err_msg=f"d at step {it}")
    assert ref.d > ref.d0 * 100, "d never grew — degenerate problem"
