"""DPM-Solver++ multistep scheduler as a fixed-shape `lax.scan` step.

The reference's pipeline inherits diffusers' scheduler-swap surface
(/root/reference/model/edgestyle_pipeline.py:382-384 `retrieve_timesteps`
works with any multistep scheduler; the app pins UniPC, app.py:118).
DPMSolverMultistepScheduler is the other sampler SD1.5 deployments
routinely run, so the rebuild carries it with the same XLA-native design
as UniPC (schedulers/unipc.py): per-step orders and log-SNR tables are
precomputed host-side into a plan, the state is a fixed `order`-slot ring
buffer of x0 predictions, and the order-dependent update dispatches with
`lax.switch` so every shape is static.

Semantics follow diffusers' scheduling_dpmsolver_multistep.py with the
SD-standard configuration: algorithm_type="dpmsolver++" (predict x0),
solver_order=2, solver_type="midpoint", lower_order_final=True,
timestep_spacing="linspace", final_sigmas_type="zero".  With a zero final
sigma the last step is always first-order (h=∞ ⇒ the update collapses to
x_T = x0), matching diffusers' `lower_order_final` gate.  One NFE per
step; no corrector (that is UniPC's addition).
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
class DPMSolverPlan:
    """Per-step constant tables, all shape (N,)."""

    timesteps: jnp.ndarray  # int32, model-facing t for each step
    lambda_s0: jnp.ndarray  # half-log-SNR at each step's source
    lambda_s1: jnp.ndarray  # … at the previous step's source (dummy at i=0)
    lambda_s2: jnp.ndarray  # … two steps back (dummy at i<2)
    lambda_t: jnp.ndarray  # half-log-SNR at each step's target
    alpha_t: jnp.ndarray
    sigma_t: jnp.ndarray
    alpha_s0: jnp.ndarray
    sigma_s0: jnp.ndarray
    order: jnp.ndarray  # int32 effective solver order per step

    @property
    def num_steps(self):
        return self.timesteps.shape[0]


class DPMSolverScheduler(ScanSampleLoop):
    def __init__(
        self,
        sched: NoiseSchedule,
        solver_order: int = 2,
        solver_type: str = "midpoint",
        lower_order_final: bool = True,
    ):
        if solver_order not in (1, 2, 3):
            raise ValueError("solver_order must be 1, 2 or 3")
        if solver_type not in ("midpoint", "heun"):
            raise ValueError("solver_type must be 'midpoint' or 'heun'")
        self.sched = sched
        self.order = solver_order
        self.solver_type = solver_type
        self.lower_order_final = lower_order_final

    # ---------------------------------------------------------- planning
    def plan(self, num_inference_steps: int) -> DPMSolverPlan:
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
        # target of step i is step i+1's source; final sigma is zero
        alpha_t = np.concatenate([alpha[1:], [1.0]])
        sigma_t = np.concatenate([sigma[1:], [0.0]])
        with np.errstate(divide="ignore"):
            lam_t = np.log(alpha_t) - np.log(sigma_t)
        # λ at the previous / second-previous step's source; the dummies at
        # the start are never read (the order table keeps those steps at
        # order ≤ warmup count)
        lam_s1 = np.concatenate([[lam[0]], lam[:-1]])
        lam_s2 = np.concatenate([[lam[0], lam[0]], lam[:-2]])

        # per-step effective order — transcription of the diffusers step()
        # gate: warmup ramp via lower_order_nums; with final_sigmas_type
        # "zero" the last step is always order 1; the second-to-last drops
        # to ≤2 only for short (<15 step) runs when lower_order_final is on
        n = num_inference_steps
        order = np.zeros(n, np.int32)
        lon = 0
        for i in range(n):
            final_first = i == n - 1  # final_sigmas_type == "zero"
            second_cap = (
                i == n - 2 and self.lower_order_final and n < 15
            )
            if self.order == 1 or lon < 1 or final_first:
                o = 1
            elif self.order == 2 or lon < 2 or second_cap:
                o = 2
            else:
                o = 3
            order[i] = o
            if lon < self.order:
                lon += 1

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return DPMSolverPlan(
            timesteps=jnp.asarray(ts, jnp.int32),
            lambda_s0=f32(lam),
            lambda_s1=f32(lam_s1),
            lambda_s2=f32(lam_s2),
            lambda_t=f32(lam_t),
            alpha_t=f32(alpha_t),
            sigma_t=f32(sigma_t),
            alpha_s0=f32(alpha),
            sigma_s0=f32(sigma),
            order=jnp.asarray(order),
        )

    # ---------------------------------------------------------- state
    def init_state(self, sample_shape, dtype=jnp.float32) -> Dict[str, Any]:
        return {
            # [0] = newest x0 prediction, like UniPC's ring
            "hist_m": jnp.zeros((self.order,) + tuple(sample_shape), jnp.float32),
        }

    def to_x0(self, model_output, sample, t):
        ac = self.sched.alphas_cumprod[t]
        a, s = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
        if self.sched.prediction_type == "epsilon":
            return (sample - s * model_output) / a
        return a * sample - s * model_output

    # ---------------------------------------------------------- core update
    def _update(self, order: int, hist_m, sample, plan: DPMSolverPlan, i):
        """One dpmsolver++ multistep update at static `order`.  All
        order-specific quantities (r0, D1, …) are computed inside the
        branch so the untaken divisions (h=∞ on the final step) never
        execute."""
        lam_s0, lam_t = plan.lambda_s0[i], plan.lambda_t[i]
        alpha_t, sigma_t = plan.alpha_t[i], plan.sigma_t[i]
        sigma_s0 = plan.sigma_s0[i]
        m0 = hist_m[0]
        h = lam_t - lam_s0
        ehm1 = jnp.expm1(-h)  # exp(-h) - 1; exactly -1 on the σ→0 final step
        x_t = (sigma_t / sigma_s0) * sample - alpha_t * ehm1 * m0
        if order == 1:
            return x_t
        m1 = hist_m[1]
        h0 = lam_s0 - plan.lambda_s1[i]
        r0 = h0 / h
        D1_0 = (m0 - m1) / r0
        if order == 2:
            if self.solver_type == "midpoint":
                return x_t - 0.5 * alpha_t * ehm1 * D1_0
            return x_t + alpha_t * (ehm1 / h + 1.0) * D1_0  # heun
        # order == 3 (diffusers uses the heun-style coefficients here)
        m2 = hist_m[2]
        h1 = plan.lambda_s1[i] - plan.lambda_s2[i]
        r1 = h1 / h
        D1_1 = (m1 - m2) / r1
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (D1_0 - D1_1) / (r0 + r1)
        return (
            x_t
            + alpha_t * (ehm1 / h + 1.0) * D1
            - alpha_t * ((ehm1 + h) / (h * h) - 0.5) * D2
        )

    # ---------------------------------------------------------- step
    def step(
        self,
        plan: DPMSolverPlan,
        i: jax.Array,
        model_output: jax.Array,
        sample: jax.Array,
        state: Dict[str, Any],
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """One DPM-Solver++ multistep update i→i+1.  `model_output` is the
        raw model output (ε or v) at (sample, plan.timesteps[i]).  Fully
        shape-static; scan-safe."""
        t = plan.timesteps[i]
        sample_f32 = sample.astype(jnp.float32)
        x0 = self.to_x0(model_output.astype(jnp.float32), sample_f32, t)

        hist_m = jnp.concatenate([x0[None], state["hist_m"][:-1]], axis=0)

        branches = [
            (lambda o=o: self._update(o, hist_m, sample_f32, plan, i))
            for o in range(1, self.order + 1)
        ]
        next_sample = jax.lax.switch(plan.order[i] - 1, branches)
        return next_sample.astype(sample.dtype), {"hist_m": hist_m}
