"""UniPC multistep scheduler as a fixed-shape `lax.scan` step.

The reference samples with diffusers' UniPCMultistepScheduler
(/root/reference/model/edgestyle_pipeline.py:382-384,520-522 via
`retrieve_timesteps`; app default 20 steps). UniPC's order-varying
predictor-corrector is the #1 "hard part" flagged in SURVEY.md §7: its
history length changes per step, which is incompatible with XLA's static
shapes. Here the state is a fixed `order`-slot ring buffer of x0
predictions + their log-SNRs; the per-step effective orders (warmup ramp,
lower-order-final) depend only on (step index, num steps) so they are
precomputed host-side into the step plan, and the order-dependent linear
algebra is dispatched with `lax.switch` over ≤3 branches — inside each
branch the order is a Python int, so every shape is static.

Semantics follow the published UniPC algorithm (predict_x0=True, bh2,
solver_order=2, lower_order_final, final sigma zero), including the
special-cased rho=0.5 for the m=1 systems and the corrector reusing the
current model output (one NFE per step).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
from edgestyle_tpu.schedulers.loop import ScanSampleLoop


@dataclasses.dataclass(frozen=True)
class UniPCPlan:
    """Per-step constant tables, all shape (N,)."""

    timesteps: jnp.ndarray  # int32, model-facing t for each step
    lambda_s0: jnp.ndarray  # half-log-SNR at each step's source
    lambda_t: jnp.ndarray  # half-log-SNR at each step's target
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    alpha_s0: jnp.ndarray
    sigma_s0: jnp.ndarray
    pred_order: jnp.ndarray  # int32 effective predictor order per step
    corr_order: jnp.ndarray  # int32 corrector order (prev step's pred order)
    use_corrector: jnp.ndarray  # bool

    @property
    def num_steps(self):
        return self.timesteps.shape[0]


def _solve_monomial(r, b):
    """Solve R x = b where R[i, j] = r[j]**i, for n = len(r) ∈ {1, 2, 3},
    in closed form (Cramer). `jnp.linalg.solve` lowers to an LU custom call
    that costs ~1.3 ms per invocation on v5e via the tunnel — ~100% of the
    scheduler's per-step time; these scalar expressions cost ~nothing and
    are algebraically the same solution."""
    n = len(r)
    if n == 1:
        return [b[0]]  # R = [[r0**0]] = [[1]]
    if n == 2:
        det = r[1] - r[0]
        return [(r[1] * b[0] - b[1]) / det, (b[1] - r[0] * b[0]) / det]
    if n == 3:
        m = [[jnp.float32(1.0), jnp.float32(1.0), jnp.float32(1.0)], r,
             [r[0] * r[0], r[1] * r[1], r[2] * r[2]]]

        def det3(a):
            return (
                a[0][0] * (a[1][1] * a[2][2] - a[1][2] * a[2][1])
                - a[0][1] * (a[1][0] * a[2][2] - a[1][2] * a[2][0])
                + a[0][2] * (a[1][0] * a[2][1] - a[1][1] * a[2][0])
            )

        d = det3(m)
        out = []
        for j in range(3):
            mj = [[b[i] if k == j else m[i][k] for k in range(3)] for i in range(3)]
            out.append(det3(mj) / d)
        return out
    raise ValueError(f"unsupported system size {n}")


def _b_coeffs(hh, B_h, K: int):
    """b_i = φ_{i+1}(hh)·i!·(i+1)!-ish recursion from the UniPC bh rule."""
    h_phi_1 = jnp.expm1(hh)
    h_phi_k = h_phi_1 / hh - 1.0
    bs = []
    fact = 1.0
    for i in range(1, K + 1):
        bs.append(h_phi_k * fact / B_h)
        fact *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / fact
    return bs  # list of K scalars


class UniPCScheduler(ScanSampleLoop):
    def __init__(
        self,
        sched: NoiseSchedule,
        solver_order: int = 2,
        lower_order_final: bool = True,
    ):
        if solver_order not in (1, 2, 3):
            raise ValueError("solver_order must be 1, 2 or 3")
        self.sched = sched
        self.order = solver_order
        self.lower_order_final = lower_order_final

    # ---------------------------------------------------------- planning
    def plan(self, num_inference_steps: int) -> UniPCPlan:
        T = self.sched.num_train_timesteps
        ac = np.asarray(self.sched.alphas_cumprod, dtype=np.float64)
        ts = (
            np.linspace(0, T - 1, num_inference_steps + 1)
            .round()[::-1][:-1]
            .astype(np.int64)
        )
        alpha = np.sqrt(ac[ts])
        sigma = np.sqrt(1.0 - ac[ts])
        lam = np.log(alpha) - np.log(sigma)
        # target of step i is step i+1's source; final target has sigma 0
        alpha_t = np.concatenate([alpha[1:], [1.0]])
        sigma_t = np.concatenate([sigma[1:], [0.0]])
        with np.errstate(divide="ignore"):
            lam_t = np.log(alpha_t) - np.log(sigma_t)

        n = num_inference_steps
        pred_order = np.zeros(n, np.int32)
        corr_order = np.zeros(n, np.int32)
        lon = 0  # lower_order_nums warmup counter
        prev = 1
        for i in range(n):
            o = min(self.order, n - i) if self.lower_order_final else self.order
            o = min(o, lon + 1)
            pred_order[i] = o
            corr_order[i] = prev
            prev = o
            if lon < self.order:
                lon += 1
        use_corr = np.arange(n) > 0

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return UniPCPlan(
            timesteps=jnp.asarray(ts, jnp.int32),
            lambda_s0=f32(lam),
            lambda_t=f32(lam_t),
            alpha_t=f32(alpha_t),
            sigma_t=f32(sigma_t),
            alpha_s0=f32(alpha),
            sigma_s0=f32(sigma),
            pred_order=jnp.asarray(pred_order),
            corr_order=jnp.asarray(corr_order),
            use_corrector=jnp.asarray(use_corr),
        )

    # ---------------------------------------------------------- state
    def init_state(self, sample_shape, dtype=jnp.float32) -> Dict[str, Any]:
        K = self.order
        return {
            "hist_m": jnp.zeros((K,) + tuple(sample_shape), jnp.float32),  # [0]=newest x0
            "hist_lambda": jnp.zeros((K,), jnp.float32),
            "last_sample": jnp.zeros(sample_shape, jnp.float32),
        }

    def to_x0(self, model_output, sample, t):
        ac = self.sched.alphas_cumprod[t]
        a, s = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
        if self.sched.prediction_type == "epsilon":
            return (sample - s * model_output) / a
        return a * sample - s * model_output

    # ---------------------------------------------------------- core update
    def _bh_update(
        self,
        order: int,  # static within a switch branch
        m0,  # anchor x0
        x,  # sample at s0
        older_m,  # (K-?, ...) older x0s; older_m[j] is j+1 older than m0
        older_lambda,
        lam_s0,
        lam_t,
        alpha_t,
        sigma_t,
        sigma_s0,
        D1_t=None,  # corrector mode: x0(target) - m0
    ):
        is_corrector = D1_t is not None
        K = self.order
        h = lam_t - lam_s0
        hh = -h  # predict_x0 mode
        B_h = jnp.expm1(hh)  # bh2 solver type
        b = _b_coeffs(hh, B_h, K)

        num_hist = order - 1
        rks, d1s = [], []
        for j in range(num_hist):
            rk = (older_lambda[j] - lam_s0) / h
            rks.append(rk)
            d1s.append((older_m[j] - m0) / rk)

        x_t_ = (sigma_t / sigma_s0) * x - alpha_t * jnp.expm1(hh) * m0

        if is_corrector:
            # solve R[:o,:o] rho = b[:o] with rks + [1.0]; o==1 → rho=[0.5]
            if order == 1:
                rhos = [jnp.float32(0.5)]
            else:
                rhos = _solve_monomial(rks + [jnp.float32(1.0)], b[:order])
            corr = jnp.zeros_like(m0)
            for j in range(num_hist):
                corr = corr + rhos[j] * d1s[j]
            corr = corr + rhos[order - 1] * D1_t
            return x_t_ - alpha_t * B_h * corr
        else:
            if num_hist == 0:
                return x_t_
            if num_hist == 1:
                rhos = [jnp.float32(0.5)]
            else:
                rhos = _solve_monomial(rks, b[:num_hist])
            pred = jnp.zeros_like(m0)
            for j in range(num_hist):
                pred = pred + rhos[j] * d1s[j]
            return x_t_ - alpha_t * B_h * pred

    # ---------------------------------------------------------- step
    def step(
        self,
        plan: UniPCPlan,
        i: jax.Array,
        model_output: jax.Array,
        sample: jax.Array,
        state: Dict[str, Any],
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """One UniPC step: corrector for the i-1→i transition (if i>0),
        then predictor i→i+1. `model_output` is the raw model output at
        (sample, plan.timesteps[i]). Fully shape-static; scan-safe."""
        K = self.order
        t = plan.timesteps[i]
        sample_f32 = sample.astype(jnp.float32)
        x0 = self.to_x0(model_output.astype(jnp.float32), sample_f32, t)

        # ---- corrector: anchor m0 = x0_{i-1}, target = t_i
        def run_corrector(s):
            branches = []
            for o in range(1, K + 1):
                branches.append(
                    lambda o=o: self._bh_update(
                        o,
                        state["hist_m"][0],
                        state["last_sample"],
                        state["hist_m"][1:],
                        state["hist_lambda"][1:],
                        state["hist_lambda"][0],
                        plan.lambda_s0[i],
                        plan.alpha_s0[i],
                        plan.sigma_s0[i],
                        plan.sigma_s0[i - 1],
                        D1_t=x0 - state["hist_m"][0],
                    )
                )
            return jax.lax.switch(plan.corr_order[i] - 1, branches)

        corrected = jax.lax.cond(
            plan.use_corrector[i], run_corrector, lambda s: s, sample_f32
        )

        # ---- push x0 into history
        new_hist_m = jnp.concatenate([x0[None], state["hist_m"][:-1]], axis=0)
        new_hist_lambda = jnp.concatenate(
            [plan.lambda_s0[i][None], state["hist_lambda"][:-1]], axis=0
        )

        # ---- predictor: anchor m0 = x0_i, from corrected sample to t_{i+1}
        pbranches = []
        for o in range(1, K + 1):
            pbranches.append(
                lambda o=o: self._bh_update(
                    o,
                    x0,
                    corrected,
                    new_hist_m[1:],
                    new_hist_lambda[1:],
                    plan.lambda_s0[i],
                    plan.lambda_t[i],
                    plan.alpha_t[i],
                    plan.sigma_t[i],
                    plan.sigma_s0[i],
                )
            )
        next_sample = jax.lax.switch(plan.pred_order[i] - 1, pbranches)

        new_state = {
            "hist_m": new_hist_m,
            "hist_lambda": new_hist_lambda,
            "last_sample": corrected,
        }
        return next_sample.astype(sample.dtype), new_state

    # sample_loop comes from ScanSampleLoop (shared with DPMSolverScheduler)
