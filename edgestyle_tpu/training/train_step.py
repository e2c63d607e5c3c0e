"""ControlLoRA finetune step — the reference's hot loop as one jitted program.

Reference: /root/reference/train_text2image_pretrained_openpose.py:1156-1297:
VAE encode + CLIP encode → noise + uniform timestep + add_noise → random
per-sample clothes↔clothes2 swap (:1194-1200) → 6-branch controlnet →
UNet ε-pred → MSE with Min-SNR-γ → clip-grad-norm 1.0 → Prodigy.

TPU-native structure:
  * trainable = {lora_0, lora_1, heads_0, heads_1, fusion} — exactly the
    reference's requires_grad set (LoRA adapters + ControlLoRA zero-conv
    heads + fusion blocks; trunk/UNet/VAE/CLIP/static-openpose frozen).
  * ControlLoRA branch params are assembled INSIDE the loss (tied trunk +
    merged LoRA), so gradients flow only into the adapters.
  * gradient accumulation = lax.scan over microbatches
    (reference bs2 × ga32) with fp32 grad accumulators.
  * data parallelism = batch arrays sharded over the mesh 'data' axis,
    params replicated; XLA inserts the psum — no Accelerate/DDP analogue
    needed (SURVEY.md §2.5).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from edgestyle_tpu.models.unet import controllora_params
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, _conv_in_apply
from edgestyle_tpu.schedulers.ddpm import NoiseSchedule, add_noise, training_target
from edgestyle_tpu.training.minsnr import min_snr_weights, weighted_mse
from edgestyle_tpu.training.prodigy import get_d, prodigy


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    snr_gamma: Optional[float] = 5.0
    max_grad_norm: float = 1.0
    # jax.checkpoint the per-microbatch loss: activations are recomputed
    # during the backward instead of saved across it. Required to fit the
    # reference recipe shape (bs2 x ga32 @ 512px) in one v5e chip's HBM —
    # the r5 soak measured the un-remat'd backward OOMing on dW conv
    # temps. Numerics are EXACT (remat recomputes the same values);
    # tested equal to the un-remat'd step.
    remat: bool = False
    optimizer: str = "prodigy"  # "prodigy" | "adamw" (reference train...py:906-948)
    learning_rate: float = 1.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    # diffusers get_scheduler names (+ legacy alias cosine_annealing);
    # "constant" when lr_total_steps is unset
    lr_scheduler: str = "cosine"
    lr_total_steps: Optional[int] = None
    lr_warmup_steps: int = 0
    lr_num_cycles: float = 1.0   # cosine_with_restarts only (reference :409)
    lr_power: float = 1.0        # polynomial only (reference :415)
    # prodigy knobs (reference train...py:454-495; prodigy.py implements all)
    prodigy_beta3: Optional[float] = None
    prodigy_decouple: bool = True
    prodigy_use_bias_correction: bool = True
    prodigy_safeguard_warmup: bool = True
    weight_decay: float = 1e-4
    swap_prob: float = 0.5
    use_agnostic: bool = False  # reference default: head crops (train...py:559)
    grad_accum: int = 1


# batch schema (mirrors the reference CollateFn output, model/utils.py:950-1019)
BATCH_KEYS = (
    "original",            # (B,H,W,3) in [-1,1]
    "agnostic",            # VAE-branch conds in [-1,1]
    "head",                # used instead of agnostic when use_agnostic=False
    "clothes",
    "clothes2",
    "original_openpose",   # conv-branch conds in [0,1]
    "clothes_openpose",
    "clothes_openpose2",
    "input_ids",           # (B,77) int32
)


def make_optimizer(cfg: TrainConfig):
    from edgestyle_tpu.training.schedules import build_lr_schedule

    if cfg.lr_total_steps or cfg.lr_warmup_steps:
        sched = build_lr_schedule(
            cfg.lr_scheduler if cfg.lr_total_steps else "constant_with_warmup",
            cfg.learning_rate, cfg.lr_warmup_steps, cfg.lr_total_steps,
            cfg.lr_num_cycles, cfg.lr_power,
        )
    else:
        sched = cfg.learning_rate
    if cfg.optimizer == "adamw":
        inner = optax.adamw(
            sched, b1=cfg.adam_beta1, b2=cfg.adam_beta2, eps=cfg.adam_epsilon,
            weight_decay=cfg.weight_decay,
        )
    else:
        inner = prodigy(
            learning_rate=sched, betas=(cfg.adam_beta1, cfg.adam_beta2),
            beta3=cfg.prodigy_beta3, eps=cfg.adam_epsilon,
            weight_decay=cfg.weight_decay, decouple=cfg.prodigy_decouple,
            use_bias_correction=cfg.prodigy_use_bias_correction,
            safeguard_warmup=cfg.prodigy_safeguard_warmup,
        )
    return optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm), inner)


def init_train_state(pipe: EdgeStylePipeline, params: Dict, cfg: TrainConfig):
    """Split the full param set into (trainable, frozen) and build the
    optimizer state. `params['controlnet']['lora_*']` must be UNMERGED
    structures here — use `init_trainable` below when starting fresh."""
    trainable = params["trainable"]
    opt = make_optimizer(cfg)
    return {
        "trainable": trainable,
        "opt_state": opt.init(trainable),
        "step": jnp.zeros([], jnp.int32),
    }


def init_trainable(pipe: EdgeStylePipeline, rng, unet_params, lora_rank: int = 32,
                   lora_conv_rank: int = 0):
    """Fresh trainable set: two LoRA adapters + their zero-conv heads +
    fusion blocks. ``lora_conv_rank`` > 0 additionally adapts every trunk
    conv (reference --controllora_conv2d_rank; its recipe keeps it 0)."""
    from edgestyle_tpu.models.unet import init_lora_params, split_trunk_params

    cfg = pipe.cfg
    k = jax.random.split(rng, 4)
    trunk = split_trunk_params(unet_params)
    lat_hw = cfg.vae.sample_size // pipe.vae_downscale
    lat = jnp.zeros((1, lat_hw, lat_hw, cfg.unet.in_channels))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, cfg.clip.max_positions, cfg.clip.hidden_size))
    emb = jnp.zeros((1, lat_hw, lat_hw, cfg.unet.block_out_channels[0]))
    cn_params = pipe.mcn.branch.init(
        k[2], lat, t, ctx, emb, method="controlnet_forward"
    )["params"]
    heads = {kk: v for kk, v in cn_params.items() if kk.startswith("controlnet_")}
    return {
        "lora_0": init_lora_params(k[0], trunk, lora_rank, lora_conv_rank),
        "lora_1": init_lora_params(k[1], trunk, lora_rank, lora_conv_rank),
        "heads_0": heads,
        "heads_1": jax.tree.map(jnp.copy, heads),
        "fusion": pipe.mcn.init_fusion(k[3], sample_hw=(lat_hw, lat_hw)),
    }


def _swap_clothes(batch, rng, swap_prob):
    """Per-sample random clothes↔clothes2 (+openpose) swap (reference
    :1194-1200), branch-free via jnp.where."""
    b = batch["clothes"].shape[0]
    flip = jax.random.bernoulli(rng, swap_prob, (b, 1, 1, 1))
    def sw(a, b_):
        return jnp.where(flip, b_, a), jnp.where(flip, a, b_)
    c, c2 = sw(batch["clothes"], batch["clothes2"])
    o, o2 = sw(batch["clothes_openpose"], batch["clothes_openpose2"])
    return {**batch, "clothes": c, "clothes2": c2,
            "clothes_openpose": o, "clothes_openpose2": o2}


def controlnet_loss_fn(
    trainable: Dict,
    frozen: Dict,
    pipe: EdgeStylePipeline,
    sched: NoiseSchedule,
    cfg: TrainConfig,
    batch: Dict[str, jax.Array],
    rng: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    r_vae, r_noise, r_t, r_swap, r_cond = jax.random.split(rng, 5)
    pcfg = pipe.cfg
    sf = pcfg.vae.scaling_factor

    batch = _swap_clothes(batch, r_swap, cfg.swap_prob)

    latents = (
        pipe.vae.apply({"params": frozen["vae"]}, batch["original"], r_vae,
                       method=pipe.vae.encode) * sf
    )
    ctx = pipe.clip.apply({"params": frozen["clip"]}, batch["input_ids"])[
        "last_hidden_state"
    ]

    b = latents.shape[0]
    noise = jax.random.normal(r_noise, latents.shape, latents.dtype)
    t = jax.random.randint(r_t, (b,), 0, sched.num_train_timesteps)
    noisy = add_noise(sched, latents, noise, t)

    # cond embeddings — VAE-latent branches (0,2,4) batched in one encode;
    # branch 0 is agnostic or head per --use_agnostic_images (reference
    # train...py:1183-1185)
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
    # conv-stack branches (1,3,5) batched in one call on the frozen openpose net
    conv_conds = jnp.concatenate(
        [batch["original_openpose"], batch["clothes_openpose"], batch["clothes_openpose2"]],
        axis=0,
    )
    emb_conv = pipe.mcn.branch.apply(
        {"params": frozen["static"]}, conv_conds, method="embed_cond"
    )
    e1, e3, e5 = emb_conv[:b], emb_conv[b : 2 * b], emb_conv[2 * b :]

    cn_params = {
        "static": frozen["static"],
        "lora_0": controllora_params(frozen["unet"], trainable["lora_0"], trainable["heads_0"]),
        "lora_1": controllora_params(frozen["unet"], trainable["lora_1"], trainable["heads_1"]),
        "fusion": trainable["fusion"],
    }
    down, mid = pipe.mcn(cn_params, noisy, t, ctx, [e0, e1, e2, e3, e4, e5])

    pred = pipe.unet.apply(
        {"params": frozen["unet"]}, noisy, t, ctx,
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    target = training_target(sched, latents, noise, t)

    if cfg.snr_gamma is None:
        loss = jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))
    else:
        w = min_snr_weights(sched, t, cfg.snr_gamma)
        loss = weighted_mse(pred, target, w)
    return loss, {"loss": loss}


def make_train_step(pipe: EdgeStylePipeline, cfg: TrainConfig, sched=None):
    """Returns train_step(state, frozen, batch, rng) → (state, metrics).

    batch arrays are shaped (grad_accum, micro_bs, ...); grad accumulation
    runs as lax.scan inside the single jitted step."""
    sched = sched or NoiseSchedule.sd15()
    opt = make_optimizer(cfg)

    def _loss(trainable, frozen, mb, r):
        # close over the static objects: jax.checkpoint only accepts
        # array arguments
        return controlnet_loss_fn(trainable, frozen, pipe, sched, cfg, mb, r)

    loss_fn = jax.checkpoint(_loss) if cfg.remat else _loss
    grad_fn = jax.grad(loss_fn, has_aux=True)

    def train_step(state, frozen, batch, rng):
        def micro(carry, inp):
            g_acc, rng = carry
            mb, = inp
            rng, r = jax.random.split(rng)
            grads, aux = grad_fn(state["trainable"], frozen, mb, r)
            g_acc = jax.tree.map(
                lambda a, g: a + g.astype(jnp.float32) / cfg.grad_accum, g_acc, grads
            )
            return (g_acc, rng), aux["loss"]

        if cfg.grad_accum == 1:
            # no accumulation needed: skip the scan's fp32 zero-init + add
            # round-trip over every trainable grad (the while-loop carry
            # defeats XLA's x+0 simplification; numerics identical — one
            # rng split, g/1 + 0 == g, grads are already fp32)
            rng, r = jax.random.split(rng)
            mb = jax.tree.map(lambda x: x[0], batch)
            grads, aux = grad_fn(state["trainable"], frozen, mb, r)
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
            losses = aux["loss"][None]
        else:
            g0 = jax.tree.map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state["trainable"]
            )
            (grads, _), losses = jax.lax.scan(micro, (g0, rng), (batch,))
        updates, opt_state = opt.update(grads, state["opt_state"], state["trainable"])
        trainable = optax.apply_updates(state["trainable"], updates)
        new_state = {
            "trainable": trainable,
            "opt_state": opt_state,
            "step": state["step"] + 1,
        }
        if cfg.optimizer == "prodigy":
            d = get_d(opt_state)
        else:
            d = jnp.asarray(cfg.learning_rate, jnp.float32)
        metrics = {"loss": jnp.mean(losses), "d": d}
        return new_state, metrics

    return train_step
