"""Shared fixed-shape `lax.scan` denoise loop for multistep schedulers.

Any scheduler exposing ``init_state(shape, dtype)`` and
``step(plan, i, model_output, sample, state)`` (with ``plan.timesteps`` and
``plan.num_steps``) gets the pipeline-facing ``sample_loop`` from this
mixin.  The reference drives its samplers through diffusers'
``scheduler.step`` host loop (/root/reference/model/edgestyle_pipeline.py:
434-543); here the whole loop is one scan so XLA sees the full graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class ScanSampleLoop:
    def sample_loop(self, plan, model_fn, init_noise, init_scale=True,
                    pass_step=False, model_state=None):
        """Run the full denoise loop under lax.scan.

        model_fn(sample, t) → raw model output (ε or v). init_noise is a
        standard-normal latent; init_noise_sigma is 1.0 for every scheduler
        here so no scaling is applied (matching diffusers). With
        ``pass_step`` the model_fn also receives the step index i (for
        per-step conditioning such as the reference's controlnet_keep
        windows, edgestyle_pipeline.py:407-427). With ``model_state`` (any
        pytree), model_fn receives it as the final positional argument and
        must return ``(model_output, new_model_state)``; the state threads
        through the scan carry (used for the pipeline's cross-step
        ControlNet-residual / deep-feature caches).
        """
        state = self.init_state(init_noise.shape, init_noise.dtype)
        has_ms = model_state is not None

        def body(carry, i):
            sample, st, ms = carry if has_ms else (*carry, None)
            t = plan.timesteps[i]
            args = (sample, t, i) if pass_step else (sample, t)
            if has_ms:
                out, ms = model_fn(*args, ms)
            else:
                out = model_fn(*args)
            nxt, st = self.step(plan, i, out, sample, st)
            return ((nxt, st, ms) if has_ms else (nxt, st)), None

        init = (init_noise, state, model_state) if has_ms else (init_noise, state)
        carry, _ = jax.lax.scan(body, init, jnp.arange(plan.num_steps))
        return carry[0]
