"""Distillation trainers (LCM-LoRA consistency + CFG-guidance) — one
jitted step per update.

NOT a reference feature: the reference serves its try-on pipeline at 20
UniPC steps (/root/reference/app.py:228-237) and has no distillation
machinery. This module is the perf lever the round-3 low-NFE study
(BASELINE.md) pointed at: below ~12 sampler steps quality collapses for
any ODE solver, and the published fix is consistency distillation —
LCM (Luo et al., arXiv:2310.04378) distilled into LoRA adapters only
(LCM-LoRA, arXiv:2311.05556 — PAPERS.md), which fits this architecture
exactly: LoRA is already the trainable currency (reference semantics:
adapters + heads + fusion are the only trainables), the checkpointing
and optimizer stack are shared with training/train_step.py, and the
serving side is ``PipelineConfig.scheduler="lcm"`` +
``cfg_interval=(0.0, 0.0)`` at 2-8 steps.

Two modes (``DistillConfig.mode``):

* ``"consistency"`` (default) — LCM-LoRA: few-step serving, the full
  algorithm below. Bootstrap supervision (student vs its own stop-grad
  target one DDIM step earlier) — converges slowly but removes 80% of
  the NFE.
* ``"guidance"`` — CFG-guidance distillation (Meng et al.,
  arXiv:2210.03142 stage 1): the student (LoRA-merged UNet, conditional
  rows only) directly regresses the frozen teacher's CFG-combined
  ε-prediction at the same (z, t), with w pinned via w_min == w_max.
  Dense supervision (no bootstrap), so it converges much faster; the
  product serves at the SAME step count but with guidance OFF
  (``cfg_interval=(0.0, 0.0)``, guidance_scale=1.0), which statically
  halves every ControlNet + UNet batch in the program — the measured
  ≈1.4-2× of the CFG-window lever (BASELINE.md) extended to ALL steps
  at distillation-bounded quality instead of approximation-bounded.

Consistency algorithm (one step), following the official LCM-LoRA SD1.5
recipe:

  x0 ~ data; t_{n+k} from a ``num_ddim_timesteps``-point DDIM grid;
  z = add_noise(x0, ε, t_{n+k}); w ~ U[w_min, w_max]
  teacher (frozen UNet + frozen six-branch MCN, one batched CFG pair):
      x̂0, ε̂ at (z, t_{n+k}) under guidance w → one DDIM step → ẑ at t_n
  student  f_θ(z, t_{n+k})   = c_skip·z + c_out·x̂0_θ      (LoRA merged)
  target   f_θ⁻(ẑ, t_n)      = c_skip·ẑ + c_out·x̂0_θ⁻     (stop-grad;
      θ⁻ = EMA(θ) when ``ema_decay`` is set, else the online θ — the
      LCM-LoRA simplification)
  loss = huber(f_θ, f_θ⁻)

The six-branch ControlNet conditioning rides through distillation
unchanged (frozen, evaluated at both the start and target points), so the
distilled LoRA is consistent for *conditioned* try-on generation — the
deployment mode this system serves.

TPU-native structure mirrors train_step.py: grad-accum via lax.scan,
fp32 accumulators, DP via the mesh 'data' axis, every model evaluation
inside ONE jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from edgestyle_tpu.models.unet import (
    LORA_LINEAR_LEAF_NAMES,
    _flatten_tree,
    _unflatten_tree,
    merge_lora,
)
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, _conv_in_apply
from edgestyle_tpu.schedulers.ddpm import NoiseSchedule, add_noise
from edgestyle_tpu.training.train_step import _swap_clothes


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    lora_rank: int = 64  # LCM-LoRA paper uses 64 for SD1.5
    # "consistency" = LCM-LoRA few-step serving; "guidance" = CFG
    # distillation (same steps, uncond half statically removed)
    mode: str = "consistency"
    num_ddim_timesteps: int = 50  # the distillation grid (k = T/50 = 20)
    w_min: float = 3.0  # CFG range baked into the student
    w_max: float = 15.0
    loss_type: str = "huber"  # "huber" | "l2"
    huber_c: float = 0.001
    timestep_scaling: float = 10.0  # boundary-condition scalings (LCM App. D)
    sigma_data: float = 0.5
    # None → the online student is its own target (the LCM-LoRA
    # simplification); a float (e.g. 0.95) keeps an EMA copy like full LCM
    ema_decay: Optional[float] = None
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    grad_accum: int = 1
    swap_prob: float = 0.5  # same data semantics as the ControlLoRA trainer
    use_agnostic: bool = False


# ----------------------------------------------------------------- LoRA set
def is_unet_lora_linear_path(path) -> bool:
    """LCM-LoRA targets: the attention/ff/time-emb linears of the WHOLE
    UNet (down + mid + up + time embedding) — unlike the ControlLoRA
    adapters (models/unet.py is_lora_linear_path), which stop at the tied
    trunk because the reference's ControlNet has no up blocks."""
    if not path or path[-1] != "kernel":
        return False
    top = path[0]
    if not (
        top.startswith("down_blocks_")
        or top.startswith("up_blocks_")
        or top in ("mid_block", "time_embedding")
    ):
        return False
    leaf_module = path[-2]
    return any(
        leaf_module == n or leaf_module.startswith(n)
        for n in LORA_LINEAR_LEAF_NAMES
    )


def init_unet_lora_params(rng, unet_params: Dict, rank: int) -> Dict:
    """{path: {'down', 'up'}} adapters over the full UNet. down ~
    N(0, 1/rank), up = 0 (diffusers LoRALinearLayer init) — so a freshly
    initialized adapter set leaves the UNet output bit-identical."""
    flat = _flatten_tree(unet_params)
    targets = [
        (path, leaf)
        for path, leaf in flat.items()
        if is_unet_lora_linear_path(path) and getattr(leaf, "ndim", 0) == 2
    ]
    keys = jax.random.split(rng, max(len(targets), 1))
    lora = {}
    for key, (path, leaf) in zip(keys, targets):
        din, dout = leaf.shape
        lora[path] = {
            "down": jax.random.normal(key, (din, rank), jnp.float32) / rank,
            "up": jnp.zeros((rank, dout), jnp.float32),
        }
    return _unflatten_tree(lora)


def apply_lcm_lora(unet_params: Dict, lcm_lora: Dict, scale: float = 1.0) -> Dict:
    """Serving-side merge: UNet params with the distilled adapters baked
    into the kernels (runs inside jit; see models/unet.merge_lora)."""
    return merge_lora(unet_params, lcm_lora, scale)


# ----------------------------------------------------------------- math
def _x0_eps(sched: NoiseSchedule, sample, model_output, t):
    """(x̂0, ε̂) from a raw model output at per-sample timesteps t."""
    ac = sched.alphas_cumprod[t].reshape((-1,) + (1,) * (sample.ndim - 1))
    a, s = jnp.sqrt(ac), jnp.sqrt(1.0 - ac)
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)
    if sched.prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - s * eps) / a
    else:  # v_prediction
        x0 = a * sample - s * model_output
        eps = a * model_output + s * sample
    return x0, eps


def _boundary_scalings(cfg: DistillConfig, t, ndim):
    """c_skip/c_out at per-sample timesteps (LCM's discrete boundary
    conditions: c_skip→1, c_out→0 as t→0 so f(x, 0) = x)."""
    st = t.astype(jnp.float32) * cfg.timestep_scaling
    sd2 = cfg.sigma_data**2
    c_skip = sd2 / (st**2 + sd2)
    c_out = st / jnp.sqrt(st**2 + sd2)
    shape = (-1,) + (1,) * (ndim - 1)
    return c_skip.reshape(shape), c_out.reshape(shape)


# ----------------------------------------------------------------- loss
def distill_loss_fn(
    lcm_lora: Dict,
    target_lora: Dict,
    frozen: Dict,
    pipe: EdgeStylePipeline,
    sched: NoiseSchedule,
    cfg: DistillConfig,
    batch: Dict[str, jax.Array],
    uncond_ctx: jax.Array,
    rng: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One consistency-distillation loss evaluation.

    ``frozen`` is the train_step.py frozen dict ({vae, clip, unet, static})
    plus the TRAINED ControlNet set under 'controlnet' (the full branch
    params as the pipeline consumes them — LoRA already merged or plain);
    ``uncond_ctx`` is the pre-encoded empty-prompt context (1, 77, D).
    """
    r_vae, r_noise, r_idx, r_w, r_swap, r_cond = jax.random.split(rng, 6)
    pcfg = pipe.cfg
    sf = pcfg.vae.scaling_factor
    T = sched.num_train_timesteps

    batch = _swap_clothes(batch, r_swap, cfg.swap_prob)

    latents = (
        pipe.vae.apply({"params": frozen["vae"]}, batch["original"], r_vae,
                       method=pipe.vae.encode) * sf
    )
    ctx = pipe.clip.apply({"params": frozen["clip"]}, batch["input_ids"])[
        "last_hidden_state"
    ]
    b = latents.shape[0]
    uctx = jnp.broadcast_to(uncond_ctx, (b,) + uncond_ctx.shape[1:]).astype(ctx.dtype)

    if cfg.mode == "guidance":
        # dense uniform timesteps — guidance distillation has no
        # bootstrap chain, so it supervises the whole t-range directly
        k = 0
        start_t = jax.random.randint(r_idx, (b,), 0, T)
        prev_t = start_t  # unused
    else:
        # --- DDIM distillation grid: t_{n+k} (start) and t_n (target)
        k = T // cfg.num_ddim_timesteps
        ddim_ts = jnp.arange(1, cfg.num_ddim_timesteps + 1, dtype=jnp.int32) * k - 1
        idx = jax.random.randint(r_idx, (b,), 0, cfg.num_ddim_timesteps)
        start_t = ddim_ts[idx]
        prev_t = jnp.maximum(start_t - k, 0)

    noise = jax.random.normal(r_noise, latents.shape, jnp.float32)
    noisy = add_noise(sched, latents.astype(jnp.float32), noise, start_t)
    w = jax.random.uniform(
        r_w, (b,) + (1,) * (latents.ndim - 1), jnp.float32, cfg.w_min, cfg.w_max
    )

    # --- conditioning embeddings (same six-branch layout as the trainer)
    first = batch["agnostic"] if cfg.use_agnostic else batch["head"]
    vae_conds = jnp.concatenate(
        [first, batch["clothes"], batch["clothes2"]], axis=0
    )
    lat_c = (
        pipe.vae.apply({"params": frozen["vae"]}, vae_conds, r_cond,
                       method=pipe.vae.encode) * sf
    )
    emb_lat = _conv_in_apply(frozen["unet"]["conv_in"], lat_c)
    e0, e2, e4 = emb_lat[:b], emb_lat[b : 2 * b], emb_lat[2 * b :]
    conv_conds = jnp.concatenate(
        [batch["original_openpose"], batch["clothes_openpose"],
         batch["clothes_openpose2"]],
        axis=0,
    )
    emb_conv = pipe.mcn.branch.apply(
        {"params": frozen["static"]}, conv_conds, method="embed_cond"
    )
    e1, e3, e5 = emb_conv[:b], emb_conv[b : 2 * b], emb_conv[2 * b :]
    embs = [e0, e1, e2, e3, e4, e5]
    embs2 = [jnp.concatenate([e, e], axis=0) for e in embs]

    cn_params = frozen["controlnet"]

    # --- one batched CFG pair of ControlNet evaluations at the start point
    # (rows: [uncond; cond] — the pipeline's CFG layout)
    z2 = jnp.concatenate([noisy, noisy], axis=0)
    t2 = jnp.concatenate([start_t, start_t], axis=0)
    ctx2 = jnp.concatenate([uctx, ctx], axis=0)
    down2, mid2 = pipe.mcn(cn_params, z2, t2, ctx2, embs2)
    down_c = tuple(d[b:] for d in down2)
    mid_c = mid2[b:]

    # --- student: LoRA-merged UNet at the conditional start point
    student_params = merge_lora(frozen["unet"], lcm_lora)
    pred_s = pipe.unet.apply(
        {"params": student_params}, noisy, start_t, ctx,
        down_block_additional_residuals=down_c,
        mid_block_additional_residual=mid_c,
    )
    x0_s, eps_s = _x0_eps(sched, noisy, pred_s, start_t)

    # --- teacher: frozen UNet, one batched CFG pair
    pred_t2 = pipe.unet.apply(
        {"params": frozen["unet"]}, z2, t2, ctx2,
        down_block_additional_residuals=down2,
        mid_block_additional_residual=mid2,
    )
    x0_t2, eps_t2 = _x0_eps(
        sched, z2, pred_t2, t2
    )
    x0_u, x0_c = x0_t2[:b], x0_t2[b:]
    eps_u, eps_c = eps_t2[:b], eps_t2[b:]
    x0_cfg = x0_c + w * (x0_c - x0_u)
    eps_cfg = eps_c + w * (eps_c - eps_u)

    if cfg.mode == "guidance":
        # CFG distillation: the cond-only student regresses the teacher's
        # guided ε at the SAME (z, t). ε-space (≈N(0,1) magnitudes) keeps
        # the loss well-conditioned at large t, where x̂0 = (z − σε)/α
        # amplifies; Meng et al. regress the model output the same way.
        diff = eps_s - jax.lax.stop_gradient(eps_cfg)
    elif cfg.mode == "consistency":
        cs_s, co_s = _boundary_scalings(cfg, start_t, noisy.ndim)
        f_student = cs_s * noisy + co_s * x0_s

        # one DDIM step along the guided teacher trajectory
        ac_prev = sched.alphas_cumprod[prev_t].reshape(
            (-1,) + (1,) * (noisy.ndim - 1)
        )
        x_prev = jnp.sqrt(ac_prev) * x0_cfg + jnp.sqrt(1.0 - ac_prev) * eps_cfg
        x_prev = jax.lax.stop_gradient(x_prev)

        # --- target: consistency estimate at the DDIM-stepped point
        tgt_lora = jax.lax.stop_gradient(
            target_lora if target_lora is not None else lcm_lora
        )
        target_params = merge_lora(frozen["unet"], tgt_lora)
        down_p, mid_p = pipe.mcn(cn_params, x_prev, prev_t, ctx, embs)
        pred_p = pipe.unet.apply(
            {"params": target_params}, x_prev, prev_t, ctx,
            down_block_additional_residuals=down_p,
            mid_block_additional_residual=mid_p,
        )
        x0_p, _ = _x0_eps(sched, x_prev, pred_p, prev_t)
        cs_p, co_p = _boundary_scalings(cfg, prev_t, noisy.ndim)
        f_target = jax.lax.stop_gradient(cs_p * x_prev + co_p * x0_p)

        diff = f_student - f_target
    else:
        raise ValueError(f"unknown distill mode {cfg.mode!r}")
    if cfg.loss_type == "huber":
        # pseudo-huber: sqrt(d² + c²) − c (the LCM-LoRA recipe's default)
        loss = jnp.mean(jnp.sqrt(jnp.square(diff) + cfg.huber_c**2) - cfg.huber_c)
    elif cfg.loss_type == "l2":
        loss = jnp.mean(jnp.square(diff))
    else:
        raise ValueError(f"unknown loss_type {cfg.loss_type!r}")
    return loss, {"loss": loss}


# ----------------------------------------------------------------- step
def make_distill_optimizer(cfg: DistillConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            cfg.learning_rate, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon, weight_decay=cfg.weight_decay,
        ),
    )


def init_distill_state(
    pipe: EdgeStylePipeline, rng, unet_params: Dict, cfg: DistillConfig
) -> Dict:
    lora = init_unet_lora_params(rng, unet_params, cfg.lora_rank)
    opt = make_distill_optimizer(cfg)
    state = {
        "lcm_lora": lora,
        "opt_state": opt.init(lora),
        "step": jnp.zeros([], jnp.int32),
    }
    if cfg.ema_decay is not None:
        state["target"] = jax.tree.map(jnp.copy, lora)
    return state


def make_distill_step(pipe: EdgeStylePipeline, cfg: DistillConfig, sched=None):
    """Returns distill_step(state, frozen, batch, uncond_ctx, rng) →
    (state, metrics). batch arrays are shaped (grad_accum, micro_bs, ...)
    like the ControlLoRA trainer's; ``frozen`` must carry the pipeline
    param set plus 'static' (the openpose branch params) and 'controlnet'
    (the full trained branch set)."""
    sched = sched or NoiseSchedule.sd15()
    if cfg.mode == "guidance" and cfg.w_min != cfg.w_max:
        # the guidance student has no w input: a random w~U[w_min,w_max]
        # gives the same (z, t, cond) a different regression target every
        # draw — irreducible target variance, silently degraded adapters.
        # One scale must be pinned (apps/distill.py defaults w_max=w_min).
        raise ValueError(
            "mode='guidance' needs a pinned CFG scale (w_min == w_max); "
            f"got w_min={cfg.w_min}, w_max={cfg.w_max}"
        )
    opt = make_distill_optimizer(cfg)
    grad_fn = jax.grad(distill_loss_fn, has_aux=True)

    def distill_step(state, frozen, batch, uncond_ctx, rng):
        target = state.get("target")

        def micro(carry, inp):
            g_acc, rng = carry
            mb, = inp
            rng, r = jax.random.split(rng)
            grads, aux = grad_fn(
                state["lcm_lora"], target, frozen, pipe, sched, cfg, mb,
                uncond_ctx, r,
            )
            g_acc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32) / cfg.grad_accum,
                g_acc, grads,
            )
            return (g_acc, rng), aux["loss"]

        if cfg.grad_accum == 1:
            rng, r = jax.random.split(rng)
            mb = jax.tree.map(lambda x: x[0], batch)
            grads, aux = grad_fn(
                state["lcm_lora"], target, frozen, pipe, sched, cfg, mb,
                uncond_ctx, r,
            )
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            losses = aux["loss"][None]
        else:
            g0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state["lcm_lora"]
            )
            (grads, _), losses = jax.lax.scan(micro, (g0, rng), (batch,))
        updates, opt_state = opt.update(
            grads, state["opt_state"], state["lcm_lora"]
        )
        lora = optax.apply_updates(state["lcm_lora"], updates)
        new_state = {
            "lcm_lora": lora,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if target is not None:
            d = cfg.ema_decay
            new_state["target"] = jax.tree.map(
                lambda tg, on: d * tg + (1.0 - d) * on, target, lora
            )
        return new_state, {"loss": jnp.mean(losses)}

    return distill_step
