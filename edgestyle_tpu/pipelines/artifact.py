"""Serve/generate from exported deployment artifacts.

The reference's second serving path drives exported graphs from a host
loop: app-onnx.py + EdgeStyleOnnxStableDiffusionControlNetPipeline
(edgestyle_onnx_pipeline.py:230-312 — ORT text encode, per-step ORT
UNet+controlnet call, torch-side scheduler.step, ORT VAE decode). This is
the TPU-native analog: the graphs are the serialized jitted programs from
apps/export.py (params are call-time inputs, so one artifact dir serves
any checkpoint), the scheduler is the same UniPC (or DPM-Solver++, via
``scheduler="dpm++"``) used in-pipeline, jitted per step index host-side.

The one-program EdgeStylePipeline remains the fast path (a host loop
pays one dispatch per denoise step); this path exists for deployment
parity and for driving the exported artifacts end-to-end.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from edgestyle_tpu.core.export import load_program
from edgestyle_tpu.schedulers.unipc import NoiseSchedule, UniPCScheduler

GRAPHS = ("text_encoder", "cond_embed", "unet_controlnet", "vae_decoder")


class ArtifactPipeline:
    """Try-on generation from an apps/export.py artifact directory."""

    def __init__(self, artifact_dir: str, scheduler: str = "unipc"):
        self.graphs = {}
        for name in GRAPHS:
            path = os.path.join(artifact_dir, f"{name}.stablehlo")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{path} missing — run apps/export.py --what all first"
                )
            self.graphs[name] = load_program(path)
        if scheduler == "unipc":
            self.scheduler = UniPCScheduler(NoiseSchedule.sd15())
        elif scheduler in ("dpm++", "dpmsolver++"):
            from edgestyle_tpu.schedulers.dpmsolver import DPMSolverScheduler

            self.scheduler = DPMSolverScheduler(NoiseSchedule.sd15())
        else:
            raise ValueError(
                f"unknown scheduler {scheduler!r} (expected 'unipc' or 'dpm++')"
            )
        self._step_cache = {}
        # the denoise graph's sample input (first non-param arg) fixes the
        # latent geometry; params are a large flat prefix, so take the
        # 4-D fp32 aval right before the scalar-timestep input
        avals = list(self.graphs["unet_controlnet"].in_avals)
        t_idx = next(
            i for i, a in enumerate(avals)
            if a.ndim == 0 and a.dtype == jnp.int32
        )
        sample_aval = avals[t_idx - 1]
        self.latent_shape = tuple(sample_aval.shape)

    def _step_fn(self, num_steps: int, i: int):
        # per-instance cache (a global lru_cache keyed on self would keep
        # discarded pipelines and their loaded graphs alive forever)
        key = (num_steps, i)
        fn = self._step_cache.get(key)
        if fn is None:
            plan = self.scheduler.plan(num_steps)
            fn = jax.jit(
                lambda out, sample, st: self.scheduler.step(plan, i, out, sample, st)
            )
            self._step_cache[key] = fn
        return fn

    def __call__(
        self,
        params,
        prompt_ids: jax.Array,
        negative_prompt_ids: jax.Array,
        cond_images: Sequence[jax.Array],
        rng: Optional[jax.Array] = None,
        num_inference_steps: int = 20,
        guidance_scale: float = 3.5,
    ) -> jax.Array:
        if rng is None:
            rng = jax.random.key(0)
        ctx = self.graphs["text_encoder"].call(
            params, prompt_ids, negative_prompt_ids
        )
        embs = list(self.graphs["cond_embed"].call(params, list(cond_images)))

        # same rng consumption as EdgeStylePipeline._generate: the full key
        # seeds the initial latents; cond embedding is deterministic (mode)
        sample = jax.random.normal(rng, self.latent_shape, jnp.float32)
        plan = self.scheduler.plan(num_inference_steps)
        state = self.scheduler.init_state(sample.shape, sample.dtype)
        gs = jnp.asarray(guidance_scale, jnp.float32)
        for i in range(num_inference_steps):
            out = self.graphs["unet_controlnet"].call(
                params, sample.astype(jnp.float32),
                jnp.asarray(plan.timesteps[i], jnp.int32), ctx, embs, gs,
            )
            sample, state = self._step_fn(num_inference_steps, i)(out, sample, state)
        return self.graphs["vae_decoder"].call(params, sample)
