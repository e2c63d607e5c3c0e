"""LCM (Latent Consistency Model) sampler as a fixed-shape `lax.scan` step.

The reference pipeline inherits diffusers' scheduler-swap surface
(/root/reference/model/edgestyle_pipeline.py:382-384 `retrieve_timesteps`
works with any scheduler object). LCMScheduler is the sampler that pairs
with LCM-LoRA-distilled weights (Luo et al. 2023, arXiv:2310.04378;
LCM-LoRA arXiv:2311.05556 — PAPERS.md): 2-8 step generation where each
step maps the noisy sample straight to a consistency-function estimate of
x0 and then re-noises to the next grid point. This is the serving-side
half of the distillation trainer in training/distill.py; with undistilled
weights it degrades to a very coarse DDIM-like sampler (useful only for
shape/speed tests).

Semantics follow diffusers' scheduling_lcm.py with the SD-standard
configuration: original_inference_steps=50, timestep_scaling=10.0,
sigma_data=0.5, epsilon prediction, strength=1. The per-step stochastic
re-noise (every step except the last) draws from a key carried in the
plan, folded with the step index — fixed-shape and scan-safe, unlike the
host-side generator loop diffusers runs.

LCM inference is guidance-free (the CFG scale w is baked in during
distillation), so pair ``PipelineConfig.scheduler="lcm"`` with
``cfg_interval=(0.0, 0.0)`` — the pipeline then evaluates only the
conditional half at every step (half-batch, no uncond context).
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
class LCMPlan:
    """Per-step constant tables, all shape (N,), plus the re-noise key."""

    timesteps: jnp.ndarray  # int32, model-facing t for each step
    alpha_s: jnp.ndarray  # sqrt(ᾱ) at each step's source t
    sigma_s: jnp.ndarray  # sqrt(1-ᾱ) at each step's source t
    alpha_p: jnp.ndarray  # sqrt(ᾱ) at the NEXT grid timestep (unused at last)
    sigma_p: jnp.ndarray  # sqrt(1-ᾱ) at the next grid timestep
    c_skip: jnp.ndarray  # consistency boundary scalings at the source t
    c_out: jnp.ndarray
    rng: jax.Array  # key for the per-step stochastic re-noise

    @property
    def num_steps(self):
        return self.timesteps.shape[0]


class LCMScheduler(ScanSampleLoop):
    """One NFE per step; no multistep history (the state is empty)."""

    # the pipeline splits its rng and passes a dedicated key to plan()
    needs_rng = True

    def __init__(
        self,
        sched: NoiseSchedule,
        original_inference_steps: int = 50,
        timestep_scaling: float = 10.0,
        sigma_data: float = 0.5,
    ):
        self.sched = sched
        self.original_inference_steps = original_inference_steps
        self.timestep_scaling = timestep_scaling
        self.sigma_data = sigma_data

    # ---------------------------------------------------------- planning
    def timestep_grid(self, num_inference_steps: int) -> np.ndarray:
        """The LCM inference grid (diffusers scheduling_lcm.set_timesteps,
        strength=1): the distillation grid is ``original_inference_steps``
        evenly spaced training timesteps ``(i+1)·(T/orig) − 1``; inference
        picks ``num_inference_steps`` of them descending via
        floor-linspace indexing."""
        T = self.sched.num_train_timesteps
        orig = self.original_inference_steps
        if orig > T:
            raise ValueError(
                f"original_inference_steps={orig} exceeds the training "
                f"schedule length {T}"
            )
        if num_inference_steps > orig:
            raise ValueError(
                f"num_inference_steps={num_inference_steps} exceeds the "
                f"distillation grid ({orig} steps) — LCM cannot sample off "
                f"the grid it was distilled on"
            )
        k = T // orig
        origin = np.arange(1, orig + 1, dtype=np.int64) * k - 1  # ascending
        idx = np.floor(
            np.linspace(0, len(origin), num_inference_steps, endpoint=False)
        ).astype(np.int64)
        return origin[::-1][idx]  # descending

    def plan(self, num_inference_steps: int, rng=None) -> LCMPlan:
        if rng is None:
            raise ValueError(
                "LCMScheduler.plan needs an rng key for the per-step "
                "stochastic re-noise (the pipeline passes one when the "
                "scheduler sets needs_rng)"
            )
        ac = np.asarray(self.sched.alphas_cumprod, dtype=np.float64)
        ts = self.timestep_grid(num_inference_steps)
        alpha_s = np.sqrt(ac[ts])
        sigma_s = np.sqrt(1.0 - ac[ts])
        # target of step i is step i+1's source; the last entry is unused
        # (the final step returns the denoised estimate without re-noising)
        prev = np.concatenate([ts[1:], [ts[-1]]])
        alpha_p = np.sqrt(ac[prev])
        sigma_p = np.sqrt(1.0 - ac[prev])
        # consistency boundary conditions (scheduling_lcm.py
        # get_scalings_for_boundary_condition_discrete): c_skip→1, c_out→0
        # as t→0 so f(x, 0) = x
        st = ts.astype(np.float64) * self.timestep_scaling
        sd2 = self.sigma_data**2
        c_skip = sd2 / (st**2 + sd2)
        c_out = st / np.sqrt(st**2 + sd2)

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        return LCMPlan(
            timesteps=jnp.asarray(ts, jnp.int32),
            alpha_s=f32(alpha_s),
            sigma_s=f32(sigma_s),
            alpha_p=f32(alpha_p),
            sigma_p=f32(sigma_p),
            c_skip=f32(c_skip),
            c_out=f32(c_out),
            rng=rng,
        )

    # ---------------------------------------------------------- state
    def init_state(self, sample_shape, dtype=jnp.float32) -> Dict[str, Any]:
        return {}  # no multistep history

    # ---------------------------------------------------------- step
    def step(
        self,
        plan: LCMPlan,
        i: jax.Array,
        model_output: jax.Array,
        sample: jax.Array,
        state: Dict[str, Any],
    ) -> Tuple[jax.Array, Dict[str, Any]]:
        """One LCM update i→i+1: consistency estimate at the source t,
        re-noise to the next grid point (skipped on the final step)."""
        sample_f32 = sample.astype(jnp.float32)
        out_f32 = model_output.astype(jnp.float32)
        a_s, s_s = plan.alpha_s[i], plan.sigma_s[i]
        if self.sched.prediction_type == "epsilon":
            x0 = (sample_f32 - s_s * out_f32) / a_s
        else:  # v_prediction
            x0 = a_s * sample_f32 - s_s * out_f32
        denoised = plan.c_out[i] * x0 + plan.c_skip[i] * sample_f32
        noise = jax.random.normal(
            jax.random.fold_in(plan.rng, i), sample.shape, jnp.float32
        )
        renoised = plan.alpha_p[i] * denoised + plan.sigma_p[i] * noise
        nxt = jnp.where(i == plan.num_steps - 1, denoised, renoised)
        return nxt.astype(sample.dtype), state
