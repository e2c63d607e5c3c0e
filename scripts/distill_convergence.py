"""Distillation convergence experiment (tiny pipeline, CPU).

The distillation stack (training/distill.py) ships correctness-tested
(tests/test_lcm.py) but its BASELINE.md entry is speed-only: quality
claims need a distillation RUN, and the real one is network-bound
(pretrained weights + data). This script closes the gap that IS closable
offline: it demonstrates end-to-end that the distillation loss actually
teaches the student the teacher's map — on the tiny random-init
pipeline, self-distilling the teacher's own 20-step UniPC generations.

Two modes (--mode):
  guidance     CFG distillation (DistillConfig.mode="guidance"): the
               student serves at the SAME 20 steps with guidance
               statically OFF. Dense supervision — expected to converge
               within this harness's budget.
  consistency  LCM-LoRA (default student_steps=4). Bootstrap
               supervision — known-slow (the LCM recipe trains for
               ~100k+ sample updates); at this harness's scale treat a
               non-flat SSIM slope as the signal, not convergence.

Protocol (teacher = frozen tiny UNet + six-branch MCN, random init):
  1. Synthesize a training set: N_train conditioning sets; for each, the
     teacher generates at ``--guidance`` (20-step UniPC) → those images
     ARE the x0 data (synthetic self-distillation; no external data).
  2. Distill LoRA adapters with w pinned to guidance-1 (the w convention
     is the CFG *delta*: x0_c + w(x0_c - x0_u), so diffusers guidance g
     ≙ w = g-1 — training/distill.py:263).
  3. Every ``--eval_every`` steps, compare the student
     against the 20-step UniPC teacher (image SSIM / latent MAE) on TWO
     eval sets sharing fixed initial noise: (a) the first ``--n_eval``
     TRAINING conditionings ("train", does the student learn the
     teacher's map where it was taught) and (b) HELD-OUT conditionings
     ("holdout", does it generalize — a much harder ask on a random-init
     teacher whose cond→image map is unstructured). Also report the
     UNDISTILLED 4-step samplers (LCM with fresh adapters, UniPC-4) as
     controls: the claim "distillation works" = the student climbs
     decisively above the fresh-adapter control toward the teacher.

Run from the repo root: ``python scripts/distill_convergence.py``
(CPU-forced; ~2-4 min at the defaults). One JSON line per eval point,
final summary line with baseline vs best SSIM.
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline  # noqa: E402
from edgestyle_tpu.training.distill import (  # noqa: E402
    DistillConfig,
    apply_lcm_lora,
    init_distill_state,
    make_distill_step,
)
from edgestyle_tpu.utils.metrics import ssim  # noqa: E402
from tests.test_pipeline import TINY_PIPE  # noqa: E402


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", type=str, default="consistency",
                   choices=["consistency", "guidance"])
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--eval_every", type=int, default=150)
    p.add_argument("--n_train", type=int, default=16)
    p.add_argument("--n_eval", type=int, default=4)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--lora_rank", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--guidance", type=float, default=7.5,
                   help="teacher guidance_scale (diffusers convention)")
    p.add_argument("--student_steps", type=int, default=None,
                   help="student NFE (default: 4 for consistency, 20 for "
                        "guidance — same count as the teacher, CFG off)")
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--num_ddim_timesteps", type=int, default=50,
                   help="the consistency distillation grid (LCM default "
                        "50). A COARSER grid (e.g. 8) shortens the "
                        "bootstrap chain — each target is closer to x0 — "
                        "at the cost of a larger per-hop solver step; the "
                        "student's LCM sampler grid is matched "
                        "automatically (it cannot sample off the grid it "
                        "was distilled on)")
    p.add_argument("--huber_c", type=float, default=0.001)
    p.add_argument("--loss_type", type=str, default="huber",
                   choices=["huber", "l2"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pretrain_teacher_steps", type=int, default=0,
                   help="pretrain the FULL tiny UNet for N steps on a "
                        "text-conditioned synthetic denoising task with "
                        "empty-prompt dropout before distilling. A "
                        "random-init teacher's CFG delta (pure text "
                        "response, amplified by w) is a chaotic feature "
                        "map with no learnable low-rank structure — "
                        "guidance distillation against it measures FLAT "
                        "(r4 runs at lr 1e-3 and 1e-2: loss pinned at its "
                        "mean, SSIM declining). Distillation's operating "
                        "regime is a TRAINED teacher; this flag "
                        "reconstructs that regime offline.")
    return p.parse_args(argv)


def pretrain_teacher(pipe, params, steps, batch=8, seed=0):
    """Train the tiny UNet so its text response is structured: per-example
    latent x0 patterns are a deterministic function of the first prompt
    tokens, and 30% of examples train with the EMPTY prompt (the
    reference's empty-prompt augmentation) so the cond/uncond difference —
    the CFG delta the guidance student must regress — carries real,
    learnable signal instead of random-feature noise."""
    import optax

    from edgestyle_tpu.schedulers.ddpm import NoiseSchedule, add_noise

    sched = NoiseSchedule.sd15()
    hw = pipe.cfg.vae.sample_size // pipe.vae_downscale
    vocab = pipe.cfg.clip.vocab_size
    opt = optax.adamw(1e-3)
    up = params["unet"]
    ostate = opt.init(up)
    clip_p = params["clip"]

    yy, xx = np.mgrid[0:hw, 0:hw].astype(np.float32) / max(hw - 1, 1)
    basis = jnp.asarray(
        np.stack([yy, xx, yy * xx, (1 - yy) * (1 - xx)]), jnp.float32
    )  # (4, hw, hw) smooth spatial basis

    def x0_from_ids(ids):
        # coefficients from the first 4 tokens → (b, 4) in [-1, 1]
        coef = (ids[:, :4].astype(jnp.float32) / vocab) * 2.0 - 1.0
        # (b, hw, hw, 4): channel c = coef[c] * basis[c]
        return jnp.einsum("bc,chw->bhwc", coef, basis) * 2.0

    @jax.jit
    def pre_step(up, ostate, ids, key):
        r1, r2, r3 = jax.random.split(key, 3)
        drop = jax.random.uniform(r3, (ids.shape[0], 1)) < 0.3
        ids_in = jnp.where(drop, jnp.zeros_like(ids), ids)
        ctx = pipe.clip.apply({"params": clip_p}, ids_in)["last_hidden_state"]
        x0 = x0_from_ids(ids)
        noise = jax.random.normal(r1, x0.shape, jnp.float32)
        t = jax.random.randint(r2, (ids.shape[0],), 0,
                               sched.num_train_timesteps)
        noisy = add_noise(sched, x0, noise, t)

        def loss_fn(up):
            pred = pipe.unet.apply({"params": up}, noisy, t, ctx)
            return jnp.mean(jnp.square(pred.astype(jnp.float32) - noise))

        loss, grads = jax.value_and_grad(loss_fn)(up)
        updates, ostate2 = opt.update(grads, ostate, up)
        return optax.apply_updates(up, updates), ostate2, loss

    g = np.random.default_rng(seed + 7)
    losses = []
    for i in range(steps):
        ids = jnp.asarray(g.integers(1, vocab, (batch, 7)), jnp.int32)
        up, ostate, loss = pre_step(up, ostate, ids, jax.random.key(i))
        losses.append(float(loss))
    print(json.dumps({
        "pretrain_teacher": steps,
        "loss_first50": round(float(np.mean(losses[:50])), 4),
        "loss_last50": round(float(np.mean(losses[-50:])), 4),
    }), file=sys.stderr, flush=True)
    return up


def make_conds(rng, n):
    """n held-apart conditioning sets in the pipeline's branch order
    [head, pose, clothes, pose_c, clothes2, pose_c2] + prompt ids."""
    ids = jnp.asarray(rng.integers(1, 99, size=(n, 7)), jnp.int32)
    # the teacher's uncond prompt is the EMPTY prompt — the same uncond_ctx
    # the distillation loss uses (training/distill.py), so the distilled
    # target and the generated reference agree on what "uncond" means
    neg = jnp.zeros((n, 7), jnp.int32)
    imgs = []
    for k in range(6):
        if k % 2 == 0:  # VAE branches, [-1, 1]
            a = rng.standard_normal((n, 32, 32, 3)).astype(np.float32) * 0.1
        else:  # conv/openpose branches, [0, 1]
            a = rng.random((n, 32, 32, 3)).astype(np.float32)
        imgs.append(jnp.asarray(a))
    return ids, neg, imgs


def main(argv=None):
    args = parse_args(argv)
    if args.student_steps is None:
        args.student_steps = 4 if args.mode == "consistency" else 20
    t0 = time.time()

    teacher_pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    # guidance mode serves with the SAME sampler at the same step count —
    # only the adapters and the statically-disabled CFG differ
    student_sched = "lcm" if args.mode == "consistency" else TINY_PIPE.scheduler
    student_pipe = EdgeStylePipeline(
        dataclasses.replace(TINY_PIPE, scheduler=student_sched),
        attn_impl="xla",
    )
    if args.mode == "consistency" and args.num_ddim_timesteps != 50:
        # serve on the SAME grid the student distills on (LCM cannot
        # sample off its distillation grid)
        from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
        from edgestyle_tpu.schedulers.lcm import LCMScheduler

        student_pipe.scheduler = LCMScheduler(
            NoiseSchedule.sd15(),
            original_inference_steps=args.num_ddim_timesteps,
        )
    params = teacher_pipe.init_params(jax.random.key(args.seed))
    if args.pretrain_teacher_steps:
        params = dict(
            params,
            unet=pretrain_teacher(teacher_pipe, params,
                                  args.pretrain_teacher_steps,
                                  seed=args.seed),
        )
        # (the zero-init ControlNet heads keep every branch residual at 0,
        # so the stale trunk tie inside params["controlnet"] is inert)
    frozen = {
        "vae": params["vae"],
        "clip": params["clip"],
        "unet": params["unet"],
        "static": params["controlnet"]["static"],
        "controlnet": params["controlnet"],
    }

    rng = np.random.default_rng(args.seed)
    tr_ids, tr_neg, tr_imgs = make_conds(rng, args.n_train)
    ev_ids, ev_neg, ev_imgs = make_conds(rng, args.n_eval)
    lat_hw = TINY_PIPE.vae.sample_size // teacher_pipe.vae_downscale
    ev_lat = jnp.asarray(
        rng.standard_normal((args.n_eval, lat_hw, lat_hw, 4)), jnp.float32
    )
    # "train" eval set: the first n_eval TRAINING conds, fixed noise
    ne = args.n_eval
    tv_ids, tv_neg = tr_ids[:ne], tr_neg[:ne]
    tv_imgs = [im[:ne] for im in tr_imgs]
    tv_lat = jnp.asarray(
        rng.standard_normal((ne, lat_hw, lat_hw, 4)), jnp.float32
    )

    # ---- 1. teacher data: 20-step UniPC generations on the train conds
    def teacher_gen(ids, neg, imgs, key, lat=None):
        return teacher_pipe(
            params, ids, neg, imgs, rng=key, num_inference_steps=20,
            guidance_scale=args.guidance, latents=lat,
        )

    print(f"# synthesizing {args.n_train} teacher generations "
          f"(20-step UniPC, g={args.guidance})", file=sys.stderr)
    data_imgs = teacher_gen(tr_ids, tr_neg, tr_imgs, jax.random.key(123))
    data_x0 = data_imgs * 2.0 - 1.0  # [0,1] → VAE input range

    # ---- 2. the distillation step (w = g-1: LCM's w is the CFG delta)
    dcfg = DistillConfig(
        mode=args.mode,
        lora_rank=args.lora_rank, w_min=args.guidance - 1.0,
        w_max=args.guidance - 1.0, learning_rate=args.lr, grad_accum=1,
        swap_prob=0.0, ema_decay=args.ema_decay,
        num_ddim_timesteps=args.num_ddim_timesteps,
        huber_c=args.huber_c, loss_type=args.loss_type,
    )
    state = init_distill_state(
        teacher_pipe, jax.random.key(args.seed + 1), params["unet"], dcfg
    )
    uncond_ctx = teacher_pipe.clip.apply(
        {"params": params["clip"]}, jnp.zeros((1, 7), jnp.int32)
    )["last_hidden_state"]
    dstep = jax.jit(make_distill_step(teacher_pipe, dcfg))

    def batch_at(idx):
        def g(x):
            return x[idx][None]  # (1=grad_accum, b, ...)

        return {
            "original": g(data_x0),
            "agnostic": g(tr_imgs[0]), "head": g(tr_imgs[0]),
            "clothes": g(tr_imgs[2]), "clothes2": g(tr_imgs[4]),
            "original_openpose": g(tr_imgs[1]),
            "clothes_openpose": g(tr_imgs[3]),
            "clothes_openpose2": g(tr_imgs[5]),
            "input_ids": g(tr_ids),
        }

    # ---- 3. eval: train + held-out conds, shared initial noise
    eval_sets = {
        "train": (tv_ids, tv_neg, tv_imgs, tv_lat),
        "holdout": (ev_ids, ev_neg, ev_imgs, ev_lat),
    }
    teacher_ref = {
        k: teacher_gen(i, n, im, jax.random.key(7), lat=la)
        for k, (i, n, im, la) in eval_sets.items()
    }

    @jax.jit
    def student_gen(lora, ids, neg, imgs, lat, key):
        sp = dict(params, unet=apply_lcm_lora(params["unet"], lora))
        return student_pipe(
            sp, ids, neg, imgs, rng=key,
            num_inference_steps=args.student_steps, guidance_scale=1.0,
            cfg_interval=(0.0, 0.0), latents=lat,
        )

    ev_key = jax.random.key(11)

    def evaluate(lora):
        res = {}
        for k, (i, n, im, la) in eval_sets.items():
            out = student_gen(lora, i, n, im, la, ev_key)
            res[f"ssim_{k}"] = round(
                float(jnp.mean(ssim(out, teacher_ref[k]))), 4)
            res[f"mae_{k}"] = round(
                float(jnp.mean(jnp.abs(out - teacher_ref[k]))), 4)
        return res

    # controls: fresh adapters (= the plain base UNet under the student's
    # sampler/CFG-off serving shape); for consistency mode additionally an
    # undistilled GUIDED few-step UniPC at the same seeds (in guidance
    # mode that program would be the teacher itself — trivially SSIM 1)
    base = evaluate(state["lcm_lora"])
    controls = dict(base)
    if args.mode == "consistency":
        for k, (i, n, im, la) in eval_sets.items():
            u4 = teacher_pipe(
                params, i, n, im, rng=ev_key,
                num_inference_steps=args.student_steps,
                guidance_scale=args.guidance, latents=la,
            )
            controls[f"control_unipc{args.student_steps}_ssim_{k}"] = round(
                float(jnp.mean(ssim(u4, teacher_ref[k]))), 4)
            # CFG-OFF few-step control: separates "the student must learn
            # the w-amplified output" (this control is low too) from "the
            # LCM sampling path is broken" (only the LCM student is low)
            u4off = teacher_pipe(
                params, i, n, im, rng=ev_key,
                num_inference_steps=args.student_steps,
                guidance_scale=1.0, cfg_interval=(0.0, 0.0), latents=la,
            )
            controls[f"control_unipc{args.student_steps}_cfgoff_ssim_{k}"] = (
                round(float(jnp.mean(ssim(u4off, teacher_ref[k]))), 4))
    print(json.dumps({"step": 0, "loss": None, **controls}), flush=True)

    history = [(0, base)]
    best = (0, base["ssim_train"])
    for step in range(1, args.steps + 1):
        idx = jnp.asarray(rng.integers(0, args.n_train, (args.batch,)))
        state, m = dstep(state, frozen, batch_at(idx), uncond_ctx,
                         jax.random.key(args.seed * 100003 + step))
        if step % args.eval_every == 0 or step == args.steps:
            lora = state.get("target", state["lcm_lora"])
            res = evaluate(lora)
            history.append((step, res))
            if res["ssim_train"] > best[1]:
                best = (step, res["ssim_train"])
            print(json.dumps({
                "step": step, "loss": round(float(m["loss"]), 5), **res,
            }), flush=True)

    final = history[-1][1]
    student_desc = ("LCM" if args.mode == "consistency"
                    else TINY_PIPE.scheduler)
    print(json.dumps({
        "summary": "distill_convergence", "mode": args.mode,
        "baseline_fresh_adapters": base,
        **{k: v for k, v in controls.items() if k.startswith("control_")},
        "final": final,
        "best_ssim_train": round(best[1], 4), "best_step": best[0],
        "teacher": f"UniPC-20 g={args.guidance}",
        "student": f"{student_desc}-{args.student_steps} cfg-off "
                   f"rank={args.lora_rank}",
        "num_ddim_timesteps": args.num_ddim_timesteps,
        "lr": args.lr, "ema_decay": args.ema_decay,
        "pretrain_teacher_steps": args.pretrain_teacher_steps,
        "wall_s": round(time.time() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
