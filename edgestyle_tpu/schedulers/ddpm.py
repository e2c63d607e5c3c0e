"""DDPM noise schedule — the training-side scheduler.

The reference trains against diffusers' DDPMScheduler loaded from the
SD1.5 checkpoint (scaled-linear betas 0.00085→0.012, 1000 steps):
`noise_scheduler.add_noise` at
/root/reference/train_text2image_pretrained_openpose.py:1181, ε/v-pred
target selection at :1243-1250, and Min-SNR-γ weights computed from
alphas_cumprod at :1253-1280 (compute_snr helper).

Everything here is a pure function of a precomputed `NoiseSchedule`
pytree, so the whole thing lives inside the jitted train step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """Precomputed schedule tables (host-side, fp32)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    num_train_timesteps: int = 1000
    prediction_type: str = "epsilon"  # or "v_prediction"

    @staticmethod
    def sd15(num_train_timesteps: int = 1000, prediction_type: str = "epsilon"):
        """scaled_linear(0.00085, 0.012) — the SD1.5 schedule."""
        betas = (
            jnp.linspace(0.00085**0.5, 0.012**0.5, num_train_timesteps, dtype=jnp.float32)
            ** 2
        )
        alphas_cumprod = jnp.cumprod(1.0 - betas)
        return NoiseSchedule(betas, alphas_cumprod, num_train_timesteps, prediction_type)

    def sqrt_alpha_prod(self, t):
        return jnp.sqrt(self.alphas_cumprod[t])

    def sqrt_one_minus_alpha_prod(self, t):
        return jnp.sqrt(1.0 - self.alphas_cumprod[t])


def _bcast(coef, like):
    return coef.reshape(coef.shape + (1,) * (like.ndim - coef.ndim))


def add_noise(sched: NoiseSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array):
    """x_t = √ᾱ_t·x0 + √(1-ᾱ_t)·ε  (diffusers DDPMScheduler.add_noise)."""
    a = _bcast(sched.sqrt_alpha_prod(t), x0)
    s = _bcast(sched.sqrt_one_minus_alpha_prod(t), x0)
    return a * x0 + s * noise


def get_velocity(sched: NoiseSchedule, x0: jax.Array, noise: jax.Array, t: jax.Array):
    """v = √ᾱ_t·ε − √(1-ᾱ_t)·x0."""
    a = _bcast(sched.sqrt_alpha_prod(t), x0)
    s = _bcast(sched.sqrt_one_minus_alpha_prod(t), x0)
    return a * noise - s * x0


def training_target(sched: NoiseSchedule, x0, noise, t):
    if sched.prediction_type == "epsilon":
        return noise
    if sched.prediction_type == "v_prediction":
        return get_velocity(sched, x0, noise, t)
    raise ValueError(f"unknown prediction_type {sched.prediction_type}")


def compute_snr(sched: NoiseSchedule, t: jax.Array):
    """SNR(t) = ᾱ_t / (1-ᾱ_t)."""
    ac = sched.alphas_cumprod[t]
    return ac / (1.0 - ac)


class DDPMScheduler:
    """Ancestral DDPM sampling step (used for tests / as a baseline sampler)."""

    def __init__(self, sched: NoiseSchedule):
        self.sched = sched

    def step(self, model_output, t, t_prev, sample, rng):
        s = self.sched
        ac_t = s.alphas_cumprod[t]
        ac_prev = jnp.where(t_prev >= 0, s.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        beta_t = 1.0 - ac_t / ac_prev
        if s.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - ac_t) * model_output) / jnp.sqrt(ac_t)
        else:
            x0 = jnp.sqrt(ac_t) * sample - jnp.sqrt(1.0 - ac_t) * model_output
        x0 = jnp.clip(x0, -1e3, 1e3)
        coef_x0 = jnp.sqrt(ac_prev) * beta_t / (1.0 - ac_t)
        coef_xt = jnp.sqrt(1.0 - beta_t) * (1.0 - ac_prev) / (1.0 - ac_t)
        mean = coef_x0 * x0 + coef_xt * sample
        var = beta_t * (1.0 - ac_prev) / (1.0 - ac_t)
        noise = jax.random.normal(rng, sample.shape, dtype=sample.dtype)
        return mean + jnp.where(t_prev >= 0, jnp.sqrt(jnp.maximum(var, 1e-20)), 0.0) * noise
