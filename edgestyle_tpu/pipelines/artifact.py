"""Serve/generate from exported deployment artifacts.

The reference's second serving path drives exported graphs from a host
loop: app-onnx.py + EdgeStyleOnnxStableDiffusionControlNetPipeline
(edgestyle_onnx_pipeline.py:230-312 — ORT text encode, per-step ORT
UNet+controlnet call, torch-side scheduler.step, ORT VAE decode). This is
the TPU-native analog with TWO artifact shapes:

* **Whole-generation program** (``generate.stablehlo`` + ``serving.json``,
  from ``apps/export.py --what generate [--mode aggressive|lcm|...]``):
  the ENTIRE generation (text encode → cond embed → denoise scan with any
  serving knobs — CFG step window, ControlNet-residual / UNet deep-feature
  caches, ToMe, int8 — → VAE decode) is one serialized jitted program.
  One device dispatch per generation; parity with the live pipeline is
  exact by construction (it IS the live pipeline's program). The baked
  serving knobs are recorded in ``serving.json`` and validated at call
  time. This is the deployment shape for the recommended serving modes.

* **Host-loop over per-stage graphs** (text_encoder / cond_embed /
  unet_controlnet / vae_decoder, from ``--what all``): the reference
  app-onnx.py shape — scheduler host-side (UniPC or DPM-Solver++, ONE
  jitted step program per step count with the step index as a traced
  argument), per-step graph dispatches. Flexible (any step count or
  sampler from one artifact dir) but pays ~2·N+3 dispatches per
  generation over a transport with a measured ~27-30 ms per-dispatch
  floor (BASELINE.md) — ≈1.2 s/image of pure dispatch floor at 20 steps
  vs the one-program path. Use it for parity/debugging, not serving.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from edgestyle_tpu.core.export import load_program
from edgestyle_tpu.schedulers.unipc import NoiseSchedule, UniPCScheduler

GRAPHS = ("text_encoder", "cond_embed", "unet_controlnet", "vae_decoder")
GENERATE_GRAPH = "generate.stablehlo"
SERVING_JSON = "serving.json"

# serving knobs baked into a generate graph, with their exact-semantics
# defaults — call-time requests are validated against the baked values
_BAKED_KNOBS = {
    "cfg_interval": (0.0, 1.0),
    "controlnet_cache_interval": 1,
    "unet_cache_interval": 1,
    "controlnet_cache_steps": None,
    "unet_cache_steps": None,
}


def _norm_knob(v):
    return tuple(v) if isinstance(v, list) else v


class ArtifactPipeline:
    """Try-on generation from an apps/export.py artifact directory."""

    def __init__(self, artifact_dir: str, scheduler: str = "unipc"):
        self.graphs = {}
        self.serving = None
        gen_path = os.path.join(artifact_dir, GENERATE_GRAPH)
        if os.path.exists(gen_path):
            # one-program mode: the whole generation is one serialized
            # jitted program; serving knobs are baked in and recorded
            self.graphs["generate"] = load_program(gen_path)
            sj = os.path.join(artifact_dir, SERVING_JSON)
            self.serving = {}
            if os.path.exists(sj):
                with open(sj) as f:
                    self.serving = json.load(f)
            # sample output shape: last out aval is the (B,H,W,3) image
            out_aval = list(self.graphs["generate"].out_avals)[-1]
            self.latent_shape = None
            self.image_shape = tuple(out_aval.shape)
            return
        for name in GRAPHS:
            path = os.path.join(artifact_dir, f"{name}.stablehlo")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"{path} missing — run apps/export.py --what all (or "
                    f"--what generate for the one-program artifact) first"
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

    @property
    def one_program(self) -> bool:
        return "generate" in self.graphs

    def _step_fn(self, num_steps: int):
        # ONE jitted scheduler-step program per step COUNT — the step
        # index is a traced argument (plan tables are (N,) arrays indexed
        # by i; UniPC's order variation is lax.switch inside step), so a
        # 20-step generation compiles 1 scheduler program, not 20.
        # Per-instance cache (a global lru_cache keyed on self would keep
        # discarded pipelines and their loaded graphs alive forever).
        fn = self._step_cache.get(num_steps)
        if fn is None:
            plan = self.scheduler.plan(num_steps)
            fn = jax.jit(
                lambda i, out, sample, st: self.scheduler.step(plan, i, out, sample, st)
            )
            self._step_cache[num_steps] = fn
        return fn

    def _check_baked(self, num_inference_steps, knobs):
        """Validate a request against the generate graph's baked config."""
        baked_steps = self.serving.get("num_inference_steps")
        if baked_steps is not None and num_inference_steps != baked_steps:
            raise ValueError(
                f"this generate artifact is baked at "
                f"{baked_steps} steps (serving.json); requested "
                f"{num_inference_steps}. Re-export with --steps, or use a "
                f"--what all artifact for variable step counts."
            )
        for name, default in _BAKED_KNOBS.items():
            baked = _norm_knob(self.serving.get(name, default))
            req = _norm_knob(knobs.get(name, default))
            if req is None:
                req = default
            if req != baked:
                raise ValueError(
                    f"this generate artifact bakes {name}={baked} "
                    f"(serving.json mode={self.serving.get('mode')!r}); "
                    f"requested {name}={req}. Re-export with the wanted "
                    f"knobs baked in."
                )

    def __call__(
        self,
        params,
        prompt_ids: jax.Array,
        negative_prompt_ids: jax.Array,
        cond_images: Sequence[jax.Array],
        rng: Optional[jax.Array] = None,
        num_inference_steps: int = 20,
        guidance_scale: float = 3.5,
        **serving_knobs,
    ) -> jax.Array:
        if rng is None:
            rng = jax.random.key(0)
        if self.one_program:
            self._check_baked(num_inference_steps, serving_knobs)
            return self.graphs["generate"].call(
                params, prompt_ids, negative_prompt_ids, list(cond_images),
                jax.random.key_data(rng),
                jnp.asarray(guidance_scale, jnp.float32),
            )
        bad = {k: v for k, v in serving_knobs.items()
               if _norm_knob(v) not in (None, _BAKED_KNOBS.get(k))}
        if bad:
            raise ValueError(
                f"the host-loop artifact path runs exact semantics only; "
                f"got serving knobs {bad}. Export a one-program artifact "
                f"(apps/export.py --what generate --mode ...) to serve "
                f"these knobs from an artifact."
            )
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
        step = self._step_fn(num_inference_steps)
        for i in range(num_inference_steps):
            out = self.graphs["unet_controlnet"].call(
                params, sample.astype(jnp.float32),
                jnp.asarray(plan.timesteps[i], jnp.int32), ctx, embs, gs,
            )
            sample, state = step(jnp.asarray(i, jnp.int32), out, sample, state)
        return self.graphs["vae_decoder"].call(params, sample)
