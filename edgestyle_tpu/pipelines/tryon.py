"""End-to-end try-on pipeline: one jitted XLA program per generation.

Mirrors the reference EdgeStyleStableDiffusionControlNetPipeline call
surface (/root/reference/model/edgestyle_pipeline.py:92-572 — prompt,
negative prompt, six control images, guidance scale, steps, seed, optional
pre-made latents) but compiles the whole generation into a single program:

  CLIP text encode (cond+uncond) → one-time cond embedding of the six
  control images (CachedControlNet semantics: VAE-latent embedding for the
  ControlLoRA branches 0/2/4, conv-stack for the openpose branches 1/3/5 —
  reference export_onnx.py:138-149 documents this split) → UniPC denoise
  scan with CFG → VAE decode → [0,1] images.

The reference runs these as ~45 separate torch module calls per generation
with host round-trips between them; here XLA sees the whole graph, so
weights stay resident, the cond embeddings are computed exactly once, and
the denoise loop is a `lax.scan` with zero host sync until the final image.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

from edgestyle_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from edgestyle_tpu.models.multicontrolnet import EdgeStyleMultiControlNet
from edgestyle_tpu.models.unet import SD15UNet, UNetConfig
from edgestyle_tpu.models.vae import AutoencoderKL, VAEConfig
from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
from edgestyle_tpu.schedulers.unipc import UniPCScheduler


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    unet: UNetConfig = UNetConfig()
    vae: VAEConfig = VAEConfig()
    clip: CLIPTextConfig = CLIPTextConfig()
    # branch pattern (reference CONTROLNET_PATTERN, train...py:63): integer
    # id → that ControlLoRA instance (VAE-latent cond), None → the shared
    # frozen conv-cond ControlNet. The reference's older 4-branch layout
    # (inference.py:500-521, controlnet-0..3) is (0, None, 1, None).
    pattern: tuple = (0, None, 1, None, 1, None)
    dtype: str = "bfloat16"
    # sampler: "unipc" (the reference app's choice, app.py:118), "dpm++"
    # (DPM-Solver++ 2M — the diffusers scheduler-swap surface the reference
    # pipeline inherits) or "lcm" (the 2-8 step sampler for LCM-LoRA
    # distilled weights, training/distill.py; pair with
    # cfg_interval=(0.0, 0.0)). All run as fixed-shape lax.scan programs
    # and support every serving knob (caches, cfg window, quant).
    scheduler: str = "unipc"

    @property
    def num_branches(self) -> int:
        return len(self.pattern)

    @property
    def latent_branches(self) -> tuple:
        return tuple(p for p, pid in enumerate(self.pattern) if pid is not None)

    @property
    def jnp_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class EdgeStylePipeline:
    """params dict layout:
      {
        'vae':  AutoencoderKL params,
        'clip': CLIPTextEncoder params,
        'unet': SD15UNet params,
        'controlnet': {'static': ..., 'lora_0': ..., 'lora_1': ..., 'fusion': ...},
      }
    """

    def __init__(
        self,
        cfg: PipelineConfig = PipelineConfig(),
        attn_impl: str = "auto",
        quant: Optional[str] = None,
        tome=None,
    ):
        self.cfg = cfg
        # opt-in W8A8 serving quantization of the denoise step (ops/quant.py;
        # not a reference feature — TPU int8-MXU perf lever). Env default so
        # bench/serve/apps pick it up without plumbing: EDGESTYLE_QUANT=int8.
        self.quant = quant if quant is not None else os.environ.get(
            "EDGESTYLE_QUANT", "none"
        )
        if self.quant not in ("none", "int8", "int8-static"):
            raise ValueError(f"unknown quant mode {self.quant!r}")
        self._int8_scales = None  # int8-static calibration table
        if self.quant.startswith("int8") and os.environ.get("EDGESTYLE_FUSED_CONV") == "1":
            # the fused-conv ResnetBlock reads kernels directly (not via
            # nn.Conv), so it cannot consume pre-quantized kernel leaves
            raise ValueError("EDGESTYLE_QUANT=int8 is incompatible with "
                             "EDGESTYLE_FUSED_CONV=1")
        # opt-in ToMe token merging (ops/tome.py; param-free, composes with
        # quant/caches/cfg window). Accepts a ToMeConfig, a bare ratio
        # float, or the EDGESTYLE_TOME=<ratio> env default
        # (EDGESTYLE_TOME_MIN / EDGESTYLE_TOME_MLP refine it).
        from edgestyle_tpu.ops.tome import ToMeConfig

        if tome is None and os.environ.get("EDGESTYLE_TOME"):
            tome = float(os.environ["EDGESTYLE_TOME"])
        if isinstance(tome, (int, float)) and not isinstance(tome, bool):
            tome = ToMeConfig(
                ratio=float(tome),
                min_tokens=int(os.environ.get("EDGESTYLE_TOME_MIN", "4096")),
                merge_mlp=os.environ.get("EDGESTYLE_TOME_MLP") == "1",
            ) if float(tome) > 0 else None
        if tome is not None and not isinstance(tome, ToMeConfig):
            raise ValueError(f"tome must be a ratio or ToMeConfig, got {tome!r}")
        self.tome = tome
        dt = cfg.jnp_dtype
        self.vae = AutoencoderKL(cfg.vae, dtype=dt)
        self.clip = CLIPTextEncoder(cfg.clip, dtype=dt)
        self.unet = SD15UNet(cfg.unet, dtype=dt, attn_impl=attn_impl, tome=tome)
        self.mcn = EdgeStyleMultiControlNet(
            cfg.unet, pattern=cfg.pattern, dtype=dt, attn_impl=attn_impl,
            tome=tome,
        )
        if cfg.scheduler == "unipc":
            self.scheduler = UniPCScheduler(NoiseSchedule.sd15())
        elif cfg.scheduler in ("dpm++", "dpmsolver++"):
            from edgestyle_tpu.schedulers.dpmsolver import DPMSolverScheduler

            self.scheduler = DPMSolverScheduler(NoiseSchedule.sd15())
        elif cfg.scheduler == "lcm":
            from edgestyle_tpu.schedulers.lcm import LCMScheduler

            self.scheduler = LCMScheduler(NoiseSchedule.sd15())
        else:
            raise ValueError(
                f"unknown scheduler {cfg.scheduler!r} "
                f"(expected 'unipc', 'dpm++' or 'lcm')"
            )
        self.vae_downscale = 2 ** (len(cfg.vae.block_out_channels) - 1)

    # ------------------------------------------------------------------
    def init_params(self, rng) -> Dict:
        """Random-init the full param set (tests, benchmarks; real use
        ports HF checkpoints via core.porting + each model's port_*)."""
        cfg = self.cfg
        k = jax.random.split(rng, 8)
        img = jnp.zeros((1, cfg.vae.sample_size, cfg.vae.sample_size, 3))
        lat_hw = cfg.vae.sample_size // self.vae_downscale
        lat = jnp.zeros((1, lat_hw, lat_hw, cfg.unet.in_channels))
        t = jnp.zeros((1,), jnp.int32)
        ctx = jnp.zeros((1, cfg.clip.max_positions, cfg.clip.hidden_size))
        ids = jnp.zeros((1, cfg.clip.max_positions), jnp.int32)
        emb = jnp.zeros((1, lat_hw, lat_hw, cfg.unet.block_out_channels[0]))

        # jit every init: eager init dispatches one RPC per op on tunneled
        # TPU backends and takes minutes at full size
        vae_p = jax.jit(self.vae.init)(k[0], img)["params"]
        clip_p = jax.jit(self.clip.init)(k[1], ids)["params"]
        unet_p = jax.jit(self.unet.init)(k[2], lat, t, ctx)["params"]

        from edgestyle_tpu.models.unet import (
            controllora_params,
            init_lora_params,
            split_trunk_params,
        )

        cn = self.mcn.branch
        static_p = jax.jit(
            lambda r: cn.init(r, lat, t, ctx, emb, method="controlnet_forward")
        )(k[3])["params"]
        static_p = {
            **static_p,
            **jax.jit(lambda r: cn.init(r, img, method="embed_cond"))(k[4])["params"],
        }
        heads = {kk: v for kk, v in static_p.items() if kk.startswith("controlnet_")}
        trunk = split_trunk_params(unet_p)
        lora_init = jax.jit(lambda r: init_lora_params(r, trunk, rank=32))
        fusion = self.mcn.init_fusion(k[7], sample_hw=(lat_hw, lat_hw))
        controlnet = {"static": static_p, "fusion": fusion}
        lora_keys = sorted(
            {g.params_key for g in self.mcn.groups if g.kind == "lora"}
        )
        for i, key in enumerate(jax.random.split(k[5], max(len(lora_keys), 1))):
            if i < len(lora_keys):
                controlnet[lora_keys[i]] = controllora_params(
                    unet_p, lora_init(key), heads
                )
        return {
            "vae": vae_p,
            "clip": clip_p,
            "unet": unet_p,
            "controlnet": controlnet,
        }

    # ------------------------------------------------------------------
    def encode_prompt(self, params, prompt_ids, negative_prompt_ids):
        """(B,77) int32 each → (2B,77,768) [uncond; cond] for CFG."""
        ids = jnp.concatenate([negative_prompt_ids, prompt_ids], axis=0)
        return self.clip.apply({"params": params["clip"]}, ids)["last_hidden_state"]

    def embed_cond_images(self, params, cond_images: Sequence[jax.Array], rng=None):
        """Six (B,512,512,3) images (value range [-1,1] for VAE branches,
        [0,1] for openpose branches, matching the reference's transform
        split, model/utils.py:20-35) → six (B,64,64,320) embeddings.

        ControlLoRA branches: vae.encode → ·sf → tied conv_in (reference
        VAEControlNetConditioningEmbedding, controllora.py:28-43; sampling
        uses the posterior mode when rng is None).
        Openpose branches: the conv-stack cond embedding."""
        cfg = self.cfg
        embs = []
        # batch the three VAE encodes into one call, and the three conv
        # stacks into one call — 6 small convnets → 2 batched ones
        latent_pos = [p for p in range(cfg.num_branches) if p in cfg.latent_branches]
        conv_pos = [p for p in range(cfg.num_branches) if p not in cfg.latent_branches]

        out: Dict[int, jax.Array] = {}
        if latent_pos:
            stacked = jnp.concatenate([cond_images[p] for p in latent_pos], axis=0)
            lat = self.vae.apply({"params": params["vae"]}, stacked, rng, method=self.vae.encode)
            lat = lat * cfg.vae.scaling_factor
            # tied conv_in of the UNet (same weights as the ControlLoRA trunk)
            emb = _conv_in_apply(params["unet"]["conv_in"], lat)
            b = cond_images[0].shape[0]
            for j, p in enumerate(latent_pos):
                out[p] = emb[j * b : (j + 1) * b]
        if conv_pos:
            stacked = jnp.concatenate([cond_images[p] for p in conv_pos], axis=0)
            emb = self.mcn.branch.apply(
                {"params": params["controlnet"]["static"]}, stacked, method="embed_cond"
            )
            b = cond_images[0].shape[0]
            for j, p in enumerate(conv_pos):
                out[p] = emb[j * b : (j + 1) * b]
        return [out[p] for p in range(cfg.num_branches)]

    # ------------------------------------------------------------------
    def _generate(
        self,
        params,
        prompt_ids,
        negative_prompt_ids,
        cond_images,
        rng,
        num_inference_steps: int,
        guidance_scale,
        conditioning_scale,
        latents,
        return_latents: bool,
        guess_mode: bool = False,
        quant_scales=None,
        controlnet_cache_interval: int = 1,
        unet_cache_interval: int = 1,
        cfg_interval=(0.0, 1.0),
        controlnet_cache_steps=None,
        unet_cache_steps=None,
    ):
        cfg = self.cfg
        b = prompt_ids.shape[0]
        if quant_scales is None and self.quant == "int8-static":
            # every entry point must pass the calibrated table explicitly
            # (a hashable static jit arg — so recalibration retraces); the
            # lazy path in __call__ fills it on the first request
            quant_scales = self._quant_scales_static()
        context = self.encode_prompt(params, prompt_ids, negative_prompt_ids)

        embs = self.embed_cond_images(params, cond_images)
        # CFG: duplicate cond embeddings for the uncond half too (reference
        # pipeline prepare_image duplicates images under CFG, :352-377)
        embs2 = [jnp.concatenate([e, e], axis=0) for e in embs]

        if getattr(self.scheduler, "needs_rng", False):
            # stochastic samplers (LCM's per-step re-noise) get their own
            # key; deterministic schedulers keep the exact pre-existing rng
            # path so their programs stay byte-identical
            rng, plan_rng = jax.random.split(rng)
            plan = self.scheduler.plan(num_inference_steps, rng=plan_rng)
        else:
            plan = self.scheduler.plan(num_inference_steps)
        if latents is None:
            # latent resolution follows the conditioning images (reference
            # pipeline derives height/width from the inputs,
            # edgestyle_pipeline.py prepare_latents); cfg.vae.sample_size is
            # only the fallback default
            if cond_images:
                h = cond_images[0].shape[1] // self.vae_downscale
                w = cond_images[0].shape[2] // self.vae_downscale
            else:
                h = w = cfg.vae.sample_size // self.vae_downscale
            latents = jax.random.normal(rng, (b, h, w, cfg.unet.in_channels), jnp.float32)

        scales = conditioning_scale
        if scales is None:
            scales = jnp.ones((cfg.num_branches,), jnp.float32)
        scales = jnp.asarray(scales, jnp.float32)
        if scales.ndim == 1:  # static per-branch → same every step
            scales = jnp.broadcast_to(scales, (num_inference_steps, cfg.num_branches))

        # scalar guidance broadcasts; a (B,) vector applies per sample so
        # requests with different guidance batch into ONE generation (the
        # reference sweeps guidance as separate generations,
        # test_text2image_pretrained_openpose.py:318-361)
        g = jnp.asarray(guidance_scale, jnp.float32)
        if g.ndim:
            g = g.reshape((b,) + (1,) * 3)

        if self.quant.startswith("int8"):
            # pre-quantize the denoise-step weight trees ONCE, outside the
            # UniPC scan — XLA does not hoist per-call weight quantization
            # out of the loop (393 ms/generation of convert_reduce fusions,
            # BASELINE.md int8 trace), and int8 kernels also halve the
            # per-step weight streaming. Must happen AFTER encode_prompt /
            # embed_cond_images, which run un-intercepted on raw params.
            from edgestyle_tpu.ops.quant import quantize_denoise_params

            params = quantize_denoise_params(params)

        # cfg_interval (static floats): the per-step CFG on/off schedule,
        # same step-window convention as the controlnet_keep mask
        # (_step_scales). All-on (the default) keeps cfg_on=None so the
        # exact program is byte-identical to before the knob existed.
        import numpy as _np

        start, end = cfg_interval
        si = _np.arange(num_inference_steps, dtype=_np.float32)
        active = ~(
            (si / num_inference_steps < start)
            | ((si + 1) / num_inference_steps > end)
        )
        # three static shapes: None → CFG every step (exact program,
        # byte-identical to before the knob); "off" → CFG on NO step (the
        # LCM / guidance-free serving path: only the half-batch program is
        # traced at all); an array → per-step lax.cond dispatch
        if bool(active.all()):
            cfg_sched = None
        elif not bool(active.any()):
            cfg_sched = "off"
        else:
            cfg_sched = jnp.asarray(active)

        def _cfg_on(i):
            if cfg_sched is None or isinstance(cfg_sched, str):
                return cfg_sched
            return cfg_sched[i]

        # Cache refresh schedules: uniform intervals and explicit step
        # tuples normalize to ONE per-step boolean refresh mask each
        # (constant arrays indexed by the traced step — the non-uniform
        # generalization DeepCache itself recommends: front-load refreshes
        # where the trajectory moves fastest). A schedule that refreshes
        # every step is the exact program.
        def _refresh_sched(interval, steps):
            if steps is None:
                if interval <= 1:
                    return None
                steps = range(0, num_inference_steps, interval)
            mask = _np.zeros((num_inference_steps,), bool)
            mask[list(steps)] = True
            if bool(mask.all()):
                return None
            return jnp.asarray(mask)

        cn_sched = _refresh_sched(
            controlnet_cache_interval, controlnet_cache_steps
        )
        deep_sched = _refresh_sched(unet_cache_interval, unet_cache_steps)
        use_cn_cache = cn_sched is not None
        use_deep_cache = deep_sched is not None
        if not (use_cn_cache or use_deep_cache):
            def model_fn(sample, t, i):
                return self._model_step(
                    params, context, embs, embs2, scales, g, b, guess_mode,
                    sample, t, i, quant_scales=quant_scales,
                    cfg_on=_cfg_on(i),
                )

            final = self.scheduler.sample_loop(
                plan, model_fn, latents, pass_step=True
            )
        else:
            # Cross-step caching (opt-in serving approximations, not
            # reference features), carried through the scan:
            #   'cn'   — ControlNet-residual cache: the six-branch MCN
            #            dominates per-step compute and its residuals vary
            #            slowly across adjacent UniPC steps, so refresh
            #            every k-th step and reuse in between (the add-on
            #            caching idea of SwiftDiffusion/DeepCache).
            #   'deep' — UNet deep-feature cache: the input to the last up
            #            block is captured on refresh steps and spliced back
            #            via SD15UNet.shallow_forward in between (DeepCache /
            #            A-SDM feature inheritance — only the
            #            highest-resolution level tracks the sample).
            # Step 0 always refreshes; the carry seed is a zeros pytree
            # shaped by eval_shape of the real computations (never executed).
            from edgestyle_tpu.ops.quant import quantize_intercept

            def shape_fn(lat):
                with quantize_intercept(
                    self.quant.startswith("int8"),
                    static_scales=dict(quant_scales) if quant_scales else None,
                ):
                    out = {}
                    if use_cn_cache:
                        out["cn"] = self._residual_step(
                            params, context, embs, embs2, scales, b,
                            guess_mode, lat, plan.timesteps[0], 0,
                        )
                    if use_deep_cache:
                        x2 = jnp.concatenate([lat, lat], axis=0)
                        t2 = jnp.broadcast_to(plan.timesteps[0], (2 * b,))
                        out["deep"] = self.unet.apply(
                            {"params": params["unet"]}, x2, t2, context,
                            return_deep=True,
                        )[1]
                    return out

            cache0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(shape_fn, latents),
            )

            def model_fn(sample, t, i, cache):
                return self._model_step(
                    params, context, embs, embs2, scales, g, b, guess_mode,
                    sample, t, i, quant_scales=quant_scales,
                    cache=cache, cn_sched=cn_sched, deep_sched=deep_sched,
                    cfg_on=_cfg_on(i),
                )

            final = self.scheduler.sample_loop(
                plan, model_fn, latents, pass_step=True, model_state=cache0
            )
        if return_latents:
            return final
        img = self.vae.apply(
            {"params": params["vae"]}, final / cfg.vae.scaling_factor, method=self.vae.decode
        )
        return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

    def save_int8_scales(self, path: str) -> None:
        """Persist the int8-static calibration table (JSON) so serving
        processes can skip the first-request calibration compile."""
        import json

        if self._int8_scales is None:
            raise RuntimeError("no calibration table to save — run "
                               "calibrate_int8 (or one generation) first")
        with open(path, "w") as f:
            json.dump(self._int8_scales, f, indent=0, sort_keys=True)

    def load_int8_scales(self, path: str) -> None:
        import json

        with open(path) as f:
            table = json.load(f)
        if not table or not all(
            isinstance(k, str) and isinstance(v, (int, float)) and v > 0
            for k, v in table.items()
        ):
            raise ValueError(f"{path} is not an int8 scale table")
        self._int8_scales = {k: float(v) for k, v in table.items()}

    def _quant_scales_static(self):
        """The int8-static calibration table as a hashable static value
        (tuple of sorted items) — baked into each trace, so replacing the
        table via calibrate_int8 genuinely retraces instead of silently
        reusing executables with the old constants."""
        if self._int8_scales is None:
            raise RuntimeError(
                "int8-static mode needs a calibration table: call "
                "calibrate_int8(...) first (EdgeStylePipeline.__call__ does "
                "this lazily on the first request)"
            )
        return tuple(sorted(self._int8_scales.items()))

    def _residual_step(
        self, params, context, embs, embs2, scales, b, guess_mode, sample, t, i,
        use_cfg: bool = True,
    ):
        """The six-branch ControlNet evaluation for one denoise step →
        (12 down residuals, mid residual), CFG-doubled to 2B rows exactly
        as the UNet consumes them. With ``use_cfg=False`` (a CFG-disabled
        step inside a ``cfg_interval`` window) only the conditional half is
        evaluated and returned at B rows. Caller must already be inside
        quantize_intercept when ``params`` holds QuantKernel leaves."""
        if not use_cfg:
            # no uncond half this step: B rows, conditional context only
            tb = jnp.broadcast_to(t, (b,))
            return self.mcn(
                params["controlnet"], sample, tb, context[b:], embs,
                scales[i], guess_mode=guess_mode,
            )
        if guess_mode:
            # controlnet sees only the conditional half; the uncond
            # half gets zero residuals (reference
            # edgestyle_pipeline.py:453-497)
            tb = jnp.broadcast_to(t, (b,))
            down, mid = self.mcn(
                params["controlnet"], sample, tb, context[b:], embs,
                scales[i], guess_mode=True,
            )
            down = tuple(
                jnp.concatenate([jnp.zeros_like(d), d], axis=0) for d in down
            )
            mid = jnp.concatenate([jnp.zeros_like(mid), mid], axis=0)
            return down, mid
        x2 = jnp.concatenate([sample, sample], axis=0)
        t2 = jnp.broadcast_to(t, (2 * b,))
        return self.mcn(params["controlnet"], x2, t2, context, embs2, scales[i])

    def _model_step(
        self, params, context, embs, embs2, scales, g, b, guess_mode,
        sample, t, i, quant_scales=None, cache=None, cn_sched=None,
        deep_sched=None, cfg_on=None,
    ):
        """One denoise-model evaluation (ControlNets + UNet + guidance
        combine). The optional W8A8 int8 path (ops/quant.py) wraps exactly
        this scope — VAE / CLIP / cond embedding stay bf16.

        ``cache`` is either None (exact path) or a dict carried through the
        scan with any of:
          'cn'   — previous-step six-branch residuals; the MCN only runs
                   on steps where ``cn_sched[i]`` is True (stale-sample
                   approximation — see ``controlnet_cache_interval`` /
                   ``controlnet_cache_steps``).
          'deep' — previous refresh's UNet deep feature; the UNet runs
                   :meth:`SD15UNet.shallow_forward` except on steps where
                   ``deep_sched[i]`` is True (DeepCache-style — see
                   ``unet_cache_interval`` / ``unet_cache_steps``).
        ``cn_sched``/``deep_sched`` are constant per-step boolean refresh
        masks (built host-side in :meth:`_generate`).
        ``cfg_on`` is either None (CFG every step — the exact path) or a
        traced bool selecting between the CFG evaluation (2B rows) and the
        half-batch conditional-only evaluation (see ``cfg_interval``).
        Returns ``(output, new_cache)`` when ``cache`` is a dict."""
        from edgestyle_tpu.ops.quant import quantize_intercept

        with quantize_intercept(
            self.quant.startswith("int8"),
            static_scales=dict(quant_scales) if quant_scales else None,
        ):
            args = (params, context, embs, embs2, scales, g, b, guess_mode,
                    sample, t, cn_sched, deep_sched)
            if cfg_on is None:
                return self._eval_step(True, *args, i, cache)
            if isinstance(cfg_on, str):  # "off": statically guidance-free
                return self._eval_step(False, *args, i, cache)
            # Both branches see/return the SAME cache pytree (2B rows);
            # the half-batch branch duplicates its refreshes into both
            # halves (see _eval_step).
            return jax.lax.cond(
                cfg_on,
                lambda ic: self._eval_step(True, *args, *ic),
                lambda ic: self._eval_step(False, *args, *ic),
                (i, cache),
            )

    def _eval_step(
        self, use_cfg, params, context, embs, embs2, scales, g, b,
        guess_mode, sample, t, cn_sched, deep_sched, i, cache,
    ):
        """The denoise-model evaluation body, parametrised (statically)
        over whether this step applies classifier-free guidance.

        With ``use_cfg=False`` the ControlNets and the UNet run at B rows
        (conditional context only) and the raw conditional prediction is
        the output — the evaluation CFG with guidance 1.0 would produce,
        at half the compute. Cache pytrees keep their CFG-doubled 2B-row
        shapes either way (lax.cond branches must agree): half-batch
        refreshes store the conditional rows duplicated into both halves,
        and reads slice the conditional half."""
        new_cache = {}
        if cache is None or "cn" not in cache:
            down, mid = self._residual_step(
                params, context, embs, embs2, scales, b, guess_mode,
                sample, t, i, use_cfg=use_cfg,
            )
        else:
            def refresh(c):
                d, m = self._residual_step(
                    params, context, embs, embs2, scales, b, guess_mode,
                    sample, t, i, use_cfg=use_cfg,
                )
                if not use_cfg:  # keep the carry at 2B rows
                    if guess_mode:
                        # guess mode mandates ZERO uncond residuals
                        # (reference edgestyle_pipeline.py:453-497): a
                        # later CFG-on step reading this refresh must see
                        # zeros in the uncond half, not duplicated
                        # conditional rows
                        d = tuple(
                            jnp.concatenate([jnp.zeros_like(x), x], axis=0)
                            for x in d
                        )
                        m = jnp.concatenate([jnp.zeros_like(m), m], axis=0)
                    else:
                        d = tuple(
                            jnp.concatenate([x, x], axis=0) for x in d
                        )
                        m = jnp.concatenate([m, m], axis=0)
                return d, m

            down2, mid2 = jax.lax.cond(
                cn_sched[i], refresh, lambda c: c, cache["cn"]
            )
            new_cache["cn"] = (down2, mid2)
            if use_cfg:
                down, mid = down2, mid2
            else:
                down = tuple(x[b:] for x in down2)
                mid = mid2[b:]
        rows = 2 * b if use_cfg else b
        x2 = jnp.concatenate([sample, sample], axis=0) if use_cfg else sample
        t2 = jnp.broadcast_to(t, (rows,))
        ctx = context if use_cfg else context[b:]
        if cache is not None and "deep" in cache:
            def full_unet(deep):
                noise, new_deep = self.unet.apply(
                    {"params": params["unet"]},
                    x2, t2, ctx,
                    down_block_additional_residuals=down,
                    mid_block_additional_residual=mid,
                    return_deep=True,
                )
                if not use_cfg:  # keep the carry at 2B rows
                    new_deep = jnp.concatenate([new_deep, new_deep], axis=0)
                return noise, new_deep

            def shallow_unet(deep):
                out = self.unet.apply(
                    {"params": params["unet"]},
                    x2, t2, ctx, deep if use_cfg else deep[b:],
                    down_block_additional_residuals=down,
                    method="shallow_forward",
                )
                return out, deep

            noise, new_deep = jax.lax.cond(
                deep_sched[i], full_unet, shallow_unet, cache["deep"],
            )
            new_cache["deep"] = new_deep
        else:
            noise = self.unet.apply(
                {"params": params["unet"]},
                x2, t2, ctx,
                down_block_additional_residuals=down,
                mid_block_additional_residual=mid,
            )
        if use_cfg:
            uncond, cond = jnp.split(noise, 2, axis=0)
            out = uncond + g * (cond - uncond)
        else:
            # cond-only prediction ≡ CFG with guidance 1.0; cast to the CFG
            # branch's f32 (g-promoted) dtype so lax.cond branches agree
            out = noise.astype(jnp.float32)
        return out if cache is None else (out, new_cache)

    @functools.partial(
        jax.jit, static_argnums=(0, 6),
        static_argnames=(
            "return_latents", "guess_mode", "quant_scales",
            "controlnet_cache_interval", "unet_cache_interval",
            "cfg_interval", "controlnet_cache_steps", "unet_cache_steps",
        ),
    )
    def _generate_jit(
        self, params, prompt_ids, negative_prompt_ids, cond_images, rng,
        num_inference_steps, guidance_scale, conditioning_scale, latents,
        return_latents=False, guess_mode=False, quant_scales=None,
        controlnet_cache_interval=1, unet_cache_interval=1,
        cfg_interval=(0.0, 1.0), controlnet_cache_steps=None,
        unet_cache_steps=None,
    ):
        return self._generate(
            params, prompt_ids, negative_prompt_ids, cond_images, rng,
            num_inference_steps, guidance_scale, conditioning_scale, latents,
            return_latents, guess_mode, quant_scales=quant_scales,
            controlnet_cache_interval=controlnet_cache_interval,
            unet_cache_interval=unet_cache_interval,
            cfg_interval=cfg_interval,
            controlnet_cache_steps=controlnet_cache_steps,
            unet_cache_steps=unet_cache_steps,
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
        conditioning_scale: Optional[Sequence[float]] = None,
        latents: Optional[jax.Array] = None,
        return_latents: bool = False,
        guess_mode: bool = False,
        control_guidance_start=0.0,
        control_guidance_end=1.0,
        controlnet_cache_interval: int = 1,
        unet_cache_interval: int = 1,
        cfg_interval=(0.0, 1.0),
        controlnet_cache_steps: Optional[Sequence[int]] = None,
        unet_cache_steps: Optional[Sequence[int]] = None,
    ):
        """Generate try-on images.

        Defaults mirror the reference app (20 steps, guidance 3.5,
        /root/reference/app.py:228-237). ``guess_mode`` and the
        ``control_guidance_start``/``end`` windows (scalar or per-branch)
        complete the reference pipeline's knob set
        (edgestyle_pipeline.py:113,407-427,453-497): windows become a
        per-step keep mask folded into conditioning_scale host-side, so
        changing them never recompiles.

        ``controlnet_cache_interval`` (opt-in, NOT a reference feature):
        with k>1 the six-branch ControlNet runs only every k-th denoise
        step and its fused residuals are reused in between — the add-on
        caching approximation of SwiftDiffusion/DeepCache. Cached
        residuals are stale in both the noisy sample and any per-step
        conditioning window/scale until the next refresh, so combine with
        control_guidance windows knowingly. k=1 (default) is exact
        reference semantics; quality/throughput measurements live in
        BASELINE.md.

        ``unet_cache_interval`` (opt-in, NOT a reference feature): with
        k>1 the UNet's deep levels (down_blocks[1:], mid, up_blocks[:-1])
        run only every k-th step; in between SD15UNet.shallow_forward
        recomputes just the highest-resolution level around the cached
        deep feature (DeepCache, arXiv:2312.00858 / A-SDM feature
        inheritance). Composes with controlnet_cache_interval — aligned
        intervals mean the deep ControlNet residuals are consumed exactly
        at refresh steps; with k_cn > 1 the deep residuals the cached
        UNet levels would consume are frozen into the deep feature.

        ``cfg_interval`` (opt-in, NOT a reference feature): apply
        classifier-free guidance only on the steps inside the
        (start, end) step-fraction window (same convention as the
        control_guidance window: step i is inside iff i/N >= start and
        (i+1)/N <= end). Outside the window the uncond half is skipped
        entirely — ControlNets and UNet run at half batch, ≈2× per-step
        compute on a compute-bound program — and the conditional
        prediction is used directly (≡ guidance 1.0). Guidance matters
        most in the early high-noise steps (guidance-interval /
        adaptive-guidance literature: Kynkäänniemi et al. 2024,
        arXiv:2404.07724; SD-Acc's phase-aware sampling), so
        ``cfg_interval=(0.0, 0.4)`` is the typical truncation. Composes
        with both cache intervals; (0.0, 1.0) is exact reference
        semantics. An EMPTY window (start == end, canonically
        ``(0.0, 0.0)``) disables guidance statically: only the half-batch
        program is traced — the serving mode for LCM-LoRA distilled
        weights (scheduler="lcm"), whose guidance is baked in at
        distillation time. When combined with caches and a window that
        re-enters CFG (start > 0), note cache refreshes during CFG-off
        steps store the conditional residuals for both halves.

        ``controlnet_cache_steps`` / ``unet_cache_steps`` (opt-in): the
        non-uniform generalization of the cache intervals — an explicit
        tuple of refresh step indices instead of an every-k schedule
        (DeepCache's own non-uniform "1+quadratic" sampling,
        arXiv:2312.00858 §4.2: the denoise trajectory moves fastest early,
        so front-loading refreshes buys quality at the same refresh
        count/speed). Must include step 0; mutually exclusive with the
        corresponding interval knob. ``steps=range(0, N, k)`` is exactly
        ``interval=k``."""
        for name, val in (
            ("controlnet_cache_interval", controlnet_cache_interval),
            ("unet_cache_interval", unet_cache_interval),
        ):
            if not isinstance(val, int) or val < 1:
                raise ValueError(
                    f"{name} must be an int >= 1, got {val!r}"
                )

        def _norm_steps(name, steps, interval):
            if steps is None:
                return None
            if interval != 1:
                raise ValueError(
                    f"{name} and its interval knob are mutually exclusive "
                    f"(got explicit steps with interval={interval})"
                )
            try:
                steps = tuple(sorted({int(s) for s in steps}))
            except (TypeError, ValueError):
                raise ValueError(
                    f"{name} must be an iterable of ints, got {steps!r}"
                )
            if not steps or steps[0] != 0:
                raise ValueError(
                    f"{name} must include step 0 (the cache seed is only "
                    f"valid once refreshed), got {steps!r}"
                )
            if steps[-1] >= num_inference_steps:
                raise ValueError(
                    f"{name} entries must be < num_inference_steps="
                    f"{num_inference_steps}, got {steps!r}"
                )
            return steps

        controlnet_cache_steps = _norm_steps(
            "controlnet_cache_steps", controlnet_cache_steps,
            controlnet_cache_interval,
        )
        unet_cache_steps = _norm_steps(
            "unet_cache_steps", unet_cache_steps, unet_cache_interval
        )
        try:
            cfg_interval = (float(cfg_interval[0]), float(cfg_interval[1]))
        except (TypeError, ValueError, IndexError):
            raise ValueError(
                f"cfg_interval must be a (start, end) pair of fractions, "
                f"got {cfg_interval!r}"
            )
        if not (
            0.0 <= cfg_interval[0] <= cfg_interval[1] <= 1.0
        ):
            raise ValueError(
                f"cfg_interval needs 0 <= start <= end <= 1, got {cfg_interval}"
            )
        self._check_inputs(prompt_ids, negative_prompt_ids, cond_images,
                           num_inference_steps, latents)
        if rng is None:
            rng = jax.random.key(0)
        conditioning_scale = self._step_scales(
            num_inference_steps, conditioning_scale,
            control_guidance_start, control_guidance_end,
        )
        guidance_scale = jnp.asarray(guidance_scale, jnp.float32)
        if guidance_scale.ndim not in (0, 1) or (
            guidance_scale.ndim == 1
            and guidance_scale.shape[0] != prompt_ids.shape[0]
        ):
            raise ValueError(
                f"guidance_scale must be a scalar or (B,), got "
                f"{guidance_scale.shape} for B={prompt_ids.shape[0]}"
            )
        quant_scales = None
        if self.quant == "int8-static":
            if self._int8_scales is None:
                # lazy calibration on the FIRST request's own inputs
                self.calibrate_int8(params, prompt_ids, negative_prompt_ids,
                                    cond_images)
            # passed as a hashable STATIC arg: a recalibrated table is a
            # different cache key, so it genuinely retraces
            quant_scales = self._quant_scales_static()
        return self._generate_jit(
            params, prompt_ids, negative_prompt_ids, tuple(cond_images), rng,
            num_inference_steps, guidance_scale, conditioning_scale,
            latents, return_latents=return_latents, guess_mode=guess_mode,
            quant_scales=quant_scales,
            controlnet_cache_interval=controlnet_cache_interval,
            unet_cache_interval=unet_cache_interval,
            cfg_interval=cfg_interval,
            controlnet_cache_steps=controlnet_cache_steps,
            unet_cache_steps=unet_cache_steps,
        )

    def calibrate_int8(
        self,
        params,
        prompt_ids: jax.Array,
        negative_prompt_ids: jax.Array,
        cond_images: Sequence[jax.Array],
        rng: Optional[jax.Array] = None,
        margin: float = 1.25,
        timesteps: Sequence[int] = (999, 749, 499, 249, 1),
    ):
        """Record per-layer activation scales for the ``int8-static`` mode.

        Runs the denoise model (ControlNets + UNet, the exact scope the
        int8 path quantizes) at a handful of timesteps with unit-normal
        latents and the given conditioning, collecting each layer's dynamic
        absmax scale via ops.quant.recording. The max over timesteps times
        ``margin`` becomes the static table; outliers beyond it are clipped
        by the static quantizer. Called lazily by :meth:`__call__` on the
        first request; call explicitly to calibrate on representative data.
        """
        from edgestyle_tpu.ops.quant import quantize_denoise_params, recording

        cfg = self.cfg
        b = prompt_ids.shape[0]
        h = w = cfg.vae.sample_size // self.vae_downscale

        # ONE jitted single-step program dispatched once per timestep —
        # compile cost ≈ one denoise step (an unrolled multi-step variant
        # measured dramatically slower to compile for zero extra signal)
        def fn(params, ids, neg, imgs, key, t):
            context = self.encode_prompt(params, ids, neg)
            embs = self.embed_cond_images(params, imgs)
            embs2 = [jnp.concatenate([e, e], axis=0) for e in embs]
            qp = quantize_denoise_params(params)
            scales = jnp.ones((1, cfg.num_branches), jnp.float32)
            lat = jax.random.normal(
                key, (b, h, w, cfg.unet.in_channels), jnp.float32
            )
            rec: Dict = {}
            with recording(rec):
                self._model_step(
                    qp, context, embs, embs2, scales,
                    jnp.float32(1.0), b, False, lat, t, 0,
                )
                return dict(rec)

        jfn = jax.jit(fn)
        key = rng if rng is not None else jax.random.key(0)
        table: Dict[str, float] = {}
        for j, t in enumerate(timesteps):
            rec = jfn(
                params, prompt_ids, negative_prompt_ids, tuple(cond_images),
                jax.random.fold_in(key, j), jnp.int32(t),
            )
            for k, v in rec.items():
                table[k] = max(table.get(k, 0.0), float(v))
        self._int8_scales = {k: v * margin for k, v in table.items()}
        return self._int8_scales

    def _step_scales(self, num_steps, conditioning_scale, start, end):
        """(num_steps, num_branches) per-step conditioning scales: the
        reference's controlnet_keep mask (edgestyle_pipeline.py:419-427:
        keep=0 when i/N < start or (i+1)/N > end) times the per-branch
        conditioning_scale."""
        import numpy as np

        n = self.cfg.num_branches
        starts = np.broadcast_to(np.asarray(start, np.float32), (n,))
        ends = np.broadcast_to(np.asarray(end, np.float32), (n,))
        i = np.arange(num_steps, dtype=np.float32)[:, None]
        keep = 1.0 - (
            (i / num_steps < starts[None, :])
            | ((i + 1) / num_steps > ends[None, :])
        ).astype(np.float32)
        scales = (
            np.ones((n,), np.float32) if conditioning_scale is None
            else np.asarray(conditioning_scale, np.float32)
        )
        return jnp.asarray(keep * scales[None, :])


    def generate_dp(
        self,
        mesh,
        params,
        prompt_ids: jax.Array,
        negative_prompt_ids: jax.Array,
        cond_images: Sequence[jax.Array],
        latents: Optional[jax.Array] = None,
        **kwargs,
    ):
        """Data-parallel batch generation over a device mesh.

        Batch rows shard over the mesh's ``data`` axis, params replicate,
        and the SAME jitted program as :meth:`__call__` runs — GSPMD
        partitions the whole denoise scan (CLIP encode, six-branch
        ControlNet, UNet, UniPC, VAE decode) across ICI with no code
        changes, because every op is batch-parallel. This is the multi-chip
        serving story the reference's torch pipeline batch dim implies
        (/root/reference/model/edgestyle_pipeline.py:429-543) but cannot
        deliver without a comm layer.

        The ``data`` axis size must divide the global batch (each device
        takes B/nd rows). Results match the single-device program (same
        global shapes + partitionable threefry → identical per-element
        RNG), tested in
        tests/test_pipeline.py::test_generate_dp_matches_single_device.
        """
        from edgestyle_tpu.core.mesh import (
            DATA_AXIS,
            batch_sharding,
            replicate_params,
        )

        b = prompt_ids.shape[0]
        nd = mesh.shape[DATA_AXIS]
        if b % nd:
            raise ValueError(
                f"global batch {b} is not divisible by the data axis size "
                f"{nd} (each device takes B/{nd} rows)"
            )
        bs = batch_sharding(mesh)
        params = replicate_params(mesh, params)
        prompt_ids = jax.device_put(prompt_ids, bs)
        negative_prompt_ids = jax.device_put(negative_prompt_ids, bs)
        cond_images = [jax.device_put(im, bs) for im in cond_images]
        if latents is not None:
            latents = jax.device_put(latents, bs)
        return self(
            params, prompt_ids, negative_prompt_ids, cond_images,
            latents=latents, **kwargs,
        )

    def generate_tp(
        self,
        mesh,
        params,
        prompt_ids: jax.Array,
        negative_prompt_ids: jax.Array,
        cond_images: Sequence[jax.Array],
        latents: Optional[jax.Array] = None,
        **kwargs,
    ):
        """Tensor-parallel (optionally DP×TP) generation over a device mesh.

        The complement of :meth:`generate_dp`: where DP shards batch rows
        for throughput, TP shards the attention/FF kernels of every
        submodel (UNet, ControlNet branches, VAE, CLIP) over the ``model``
        axis (megatron-style, core/partitioning.py) so ONE image's denoise
        step spreads across chips — the multi-chip LATENCY story. Batch
        rows still shard over ``data`` when that axis is >1, giving DP×TP
        from the same jitted program; GSPMD emits one all-reduce per
        attention/FF block over ICI plus the usual batch partitioning.
        Kernels whose dimension doesn't divide the ``model`` axis simply
        replicate (core/partitioning.py guard), so any config runs.

        Not a reference capability (its torch pipeline is single-device,
        edgestyle_pipeline.py:429-543). Equality with the single-device
        program is up to reduction order — tested in
        tests/test_pipeline.py::test_generate_tp_matches_single_device.
        """
        from edgestyle_tpu.core.mesh import DATA_AXIS, batch_sharding
        from edgestyle_tpu.core.partitioning import shard_params_tp

        b = prompt_ids.shape[0]
        nd = mesh.shape[DATA_AXIS]
        if b % nd:
            raise ValueError(
                f"global batch {b} is not divisible by the data axis size "
                f"{nd} (each device row takes B/{nd} samples)"
            )
        bs = batch_sharding(mesh)
        params = {k: shard_params_tp(mesh, v) for k, v in params.items()}
        prompt_ids = jax.device_put(prompt_ids, bs)
        negative_prompt_ids = jax.device_put(negative_prompt_ids, bs)
        cond_images = [jax.device_put(im, bs) for im in cond_images]
        if latents is not None:
            latents = jax.device_put(latents, bs)
        return self(
            params, prompt_ids, negative_prompt_ids, cond_images,
            latents=latents, **kwargs,
        )

    def _check_inputs(self, prompt_ids, negative_prompt_ids, cond_images,
                      num_inference_steps, latents):
        """Host-side validation (reference check_inputs,
        edgestyle_pipeline.py:267-307; resolution%8 check train...py:640)."""
        cfg = self.cfg
        if prompt_ids.shape != negative_prompt_ids.shape:
            raise ValueError(
                f"prompt ids {prompt_ids.shape} vs negative {negative_prompt_ids.shape}"
            )
        if prompt_ids.ndim != 2 or prompt_ids.shape[1] != cfg.clip.max_positions:
            raise ValueError(
                f"prompt_ids must be (B, {cfg.clip.max_positions}), got {prompt_ids.shape}"
            )
        if len(cond_images) != cfg.num_branches:
            raise ValueError(
                f"expected {cfg.num_branches} control images, got {len(cond_images)}"
            )
        b = prompt_ids.shape[0]
        for i, im in enumerate(cond_images):
            if im.ndim != 4 or im.shape[0] != b or im.shape[-1] != 3:
                raise ValueError(
                    f"cond image {i}: expected (B={b}, H, W, 3), got {tuple(im.shape)}"
                )
            if im.shape[1] % 8 or im.shape[2] % 8:
                raise ValueError(
                    f"cond image {i}: H/W must be divisible by 8, got {tuple(im.shape)}"
                )
        if num_inference_steps < 1:
            raise ValueError("num_inference_steps must be >= 1")
        if latents is not None:
            # explicit latents must match the geometry _generate would
            # derive: the conditioning images' resolution when given
            # (reference prepare_latents follows the inputs), else the
            # config default
            if cond_images:
                h = cond_images[0].shape[1] // self.vae_downscale
                w = cond_images[0].shape[2] // self.vae_downscale
            else:
                h = w = cfg.vae.sample_size // self.vae_downscale
            want = (b, h, w, cfg.unet.in_channels)
            if tuple(latents.shape) != want:
                raise ValueError(f"latents must be {want}, got {tuple(latents.shape)}")

    # ------------------------------------------------------------------


def _conv_in_apply(conv_params, x):
    """Apply the UNet's conv_in params functionally (3x3, pad 1)."""
    k = conv_params["kernel"]
    out = jax.lax.conv_general_dilated(
        x.astype(k.dtype), k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + conv_params["bias"]
