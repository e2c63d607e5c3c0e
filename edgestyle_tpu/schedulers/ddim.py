"""DDIM sampler as a stateless fixed-shape step (eta=0, deterministic).

Baseline sampler and cross-check for UniPC. Timestep spacing follows
diffusers' "leading" convention used by SD1.5 DDIM configs.
"""

from __future__ import annotations

import jax.numpy as jnp

from edgestyle_tpu.schedulers.ddpm import NoiseSchedule


class DDIMScheduler:
    def __init__(self, sched: NoiseSchedule):
        self.sched = sched

    def timesteps(self, num_inference_steps: int, spacing: str = "leading"):
        T = self.sched.num_train_timesteps
        if spacing == "leading":
            ratio = T // num_inference_steps
            ts = (jnp.arange(num_inference_steps) * ratio).round()[::-1].astype(jnp.int32)
        elif spacing == "linspace":
            ts = jnp.linspace(0, T - 1, num_inference_steps).round()[::-1].astype(jnp.int32)
        else:
            raise ValueError(spacing)
        return ts

    def step(self, model_output, t, t_prev, sample):
        s = self.sched
        ac_t = s.alphas_cumprod[t]
        ac_prev = jnp.where(t_prev >= 0, s.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        if s.prediction_type == "epsilon":
            x0 = (sample - jnp.sqrt(1.0 - ac_t) * model_output) / jnp.sqrt(ac_t)
            eps = model_output
        else:  # v_prediction
            x0 = jnp.sqrt(ac_t) * sample - jnp.sqrt(1.0 - ac_t) * model_output
            eps = jnp.sqrt(ac_t) * model_output + jnp.sqrt(1.0 - ac_t) * sample
        return jnp.sqrt(ac_prev) * x0 + jnp.sqrt(1.0 - ac_prev) * eps
