"""LCM-LoRA consistency-distillation driver.

NOT a reference feature (the reference has no distillation machinery —
its serving floor is the 20-step UniPC recipe, /root/reference/app.py:
228-237). This CLI distills the frozen try-on stack (SD1.5 UNet + trained
six-branch MultiControlNet) into LCM-LoRA adapters (training/distill.py;
LCM arXiv:2310.04378, LCM-LoRA arXiv:2311.05556) so the pipeline can
serve at 2-8 steps with ``--scheduler lcm --cfg_interval 0 0``.

Shape mirrors apps/train.py: one jitted step, grad-accum scan, DP over
the mesh 'data' axis, orbax checkpoint rotation + resume, TensorBoard
loss, synthetic-batch smoke mode when no dataset is given.

Typical recipe (after ControlLoRA training):

  python -m edgestyle_tpu.apps.distill \\
      --pretrained_model <sd15_dir> --vae <vae_dir> \\
      --openpose_controlnet <openpose_dir> \\
      --edgestyle_checkpoint <trained_controlnet_dir_or_safetensors> \\
      --dataset_dir data/train --max_train_steps 2000

The result (``lcm_lora.safetensors``) merges into the UNet at serving
time via ``--lcm_lora`` on tryon/serve (training.distill.apply_lcm_lora).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="EdgeStyle-TPU LCM-LoRA consistency distillation"
    )
    p.add_argument("--pretrained_model", "--pretrained_model_name_or_path",
                   type=str, default=None, dest="pretrained_model")
    p.add_argument("--vae", "--pretrained_vae_name_or_path", type=str,
                   default=None, dest="vae")
    p.add_argument("--openpose_controlnet",
                   "--pretrained_openpose_name_or_path", type=str,
                   default=None, dest="openpose_controlnet")
    p.add_argument("--edgestyle_checkpoint",
                   "--controlnet_model_name_or_path", type=str, default=None,
                   dest="edgestyle_checkpoint",
                   help="trained try-on ControlNet set (reference-layout dir "
                        "or trainable safetensors); distillation conditions "
                        "on it frozen")
    p.add_argument("--random_init", action="store_true",
                   help="random-init the whole stack (smoke/test mode)")
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--use_agnostic_images",
                   action=argparse.BooleanOptionalAction, default=False)
    # distillation knobs (training/distill.py DistillConfig)
    p.add_argument("--distill_mode", type=str, default="consistency",
                   choices=["consistency", "guidance"],
                   help="consistency = LCM-LoRA few-step serving; guidance "
                        "= CFG distillation (serve at the same step count "
                        "with guidance statically off — pin the baked-in "
                        "scale via --w_min/--w_max, w = guidance-1)")
    p.add_argument("--lora_rank", type=int, default=64)
    p.add_argument("--num_ddim_timesteps", type=int, default=50)
    p.add_argument("--w_min", type=float, default=3.0)
    p.add_argument("--w_max", type=float, default=None,
                   help="upper end of the w~U[w_min,w_max] CFG range "
                        "(consistency mode; default 15). guidance mode "
                        "needs ONE pinned scale — the student has no w "
                        "input — so it defaults to w_min and any other "
                        "value is rejected")
    p.add_argument("--loss_type", type=str, default="huber",
                   choices=["huber", "l2"])
    p.add_argument("--huber_c", type=float, default=0.001)
    p.add_argument("--ema_decay", type=float, default=None,
                   help="EMA target-network decay; unset = online target "
                        "(the LCM-LoRA simplification)")
    p.add_argument("--learning_rate", type=float, default=1e-4)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--adam_weight_decay", type=float, default=0.0)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--max_train_steps", type=int, default=1000)
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "bf16", "fp16"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", type=str, default="./edgestyle-lcm-out")
    p.add_argument("--logging_dir", type=str, default="logs")
    p.add_argument("--checkpointing_steps", type=int, default=100)
    p.add_argument("--checkpoints_total_limit", type=int, default=5)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--logging_steps", type=int, default=10)
    p.add_argument("--dataloader_num_workers", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from edgestyle_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.apps.train import check_batch_divisible
    from edgestyle_tpu.core.mesh import MeshSpec, make_mesh, replicated
    from edgestyle_tpu.data.tokenizer import empty_prompt_ids
    from edgestyle_tpu.models.vae import VAEConfig
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
    from edgestyle_tpu.training.checkpoint import (
        export_safetensors,
        load_checkpoint,
        save_checkpoint,
    )
    from edgestyle_tpu.training.distill import (
        DistillConfig,
        init_distill_state,
        make_distill_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    dtype = "float32" if args.mixed_precision == "no" else "bfloat16"
    pipe = EdgeStylePipeline(
        PipelineConfig(dtype=dtype, vae=VAEConfig(sample_size=args.resolution))
    )
    rng = jax.random.key(args.seed)

    if args.random_init:
        params = pipe.init_params(rng)
    else:
        from edgestyle_tpu.core.pretrained import load_pipeline_params

        params = load_pipeline_params(
            args.pretrained_model, args.vae, args.openpose_controlnet,
            edgestyle_checkpoint=args.edgestyle_checkpoint,
        )

    frozen = {
        "vae": params["vae"],
        "clip": params["clip"],
        "unet": params["unet"],
        "static": params["controlnet"]["static"],
        "controlnet": params["controlnet"],
    }

    dcfg = DistillConfig(
        mode=args.distill_mode,
        lora_rank=args.lora_rank,
        num_ddim_timesteps=args.num_ddim_timesteps,
        w_min=args.w_min,
        # guidance mode regresses onto a single baked-in scale (the student
        # has no w input) — an unpinned range would make the target random
        w_max=args.w_max if args.w_max is not None
        else (args.w_min if args.distill_mode == "guidance" else 15.0),
        loss_type=args.loss_type,
        huber_c=args.huber_c,
        ema_decay=args.ema_decay,
        learning_rate=args.learning_rate,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_epsilon=args.adam_epsilon,
        weight_decay=args.adam_weight_decay,
        max_grad_norm=args.max_grad_norm,
        grad_accum=args.gradient_accumulation_steps,
        use_agnostic=args.use_agnostic_images,
    )
    state = init_distill_state(pipe, rng, params["unet"], dcfg)
    if args.resume_from_checkpoint:
        state = load_checkpoint(
            args.output_dir, state,
            "latest" if args.resume_from_checkpoint == "latest"
            else int(args.resume_from_checkpoint),
        )

    check_batch_divisible(args.train_batch_size, jax.device_count())
    mesh = make_mesh(MeshSpec(data=jax.device_count()))
    repl = replicated(mesh)
    batch_sh = NamedSharding(mesh, P(None, "data"))
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    frozen = jax.tree.map(lambda x: jax.device_put(x, repl), frozen)

    # jitted: an eager CLIP forward on the tunneled TPU dispatches one RPC
    # per op (~27-30 ms floor each — minutes of startup; CLAUDE.md rule)
    uncond_ctx = jax.jit(
        lambda p, ids: pipe.clip.apply({"params": p}, ids)["last_hidden_state"]
    )(frozen["clip"], jnp.asarray(empty_prompt_ids(1, pipe.cfg.clip.max_positions)))
    uncond_ctx = jax.device_put(uncond_ctx, repl)

    step_fn = jax.jit(make_distill_step(pipe, dcfg))

    if args.dataset_dir:
        from edgestyle_tpu.data.dataset import EdgeStyleLocalDataset, data_loader

        ds = EdgeStyleLocalDataset(args.dataset_dir, resolution=args.resolution)
        if args.max_train_samples:
            ds.index = ds.index[: args.max_train_samples]
        loader = data_loader(
            ds, args.train_batch_size * args.gradient_accumulation_steps,
            args.gradient_accumulation_steps, seed=args.seed,
            num_workers=args.dataloader_num_workers,
        )
    else:
        from edgestyle_tpu.apps.train import _synthetic_loader

        loader = _synthetic_loader(args)
    if args.dataloader_num_workers > 0:
        from edgestyle_tpu.data.prefetch import prefetch

        loader = prefetch(loader, depth=2)

    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(args.output_dir, args.logging_dir))
    except Exception:
        writer = None

    t0 = time.time()
    for step_i, batch in enumerate(loader):
        if int(np.asarray(state["step"])) >= args.max_train_steps:
            break
        batch = jax.tree.map(lambda x: jax.device_put(x, batch_sh), batch)
        rng, r = jax.random.split(rng)
        state, metrics = step_fn(state, frozen, batch, uncond_ctx, r)
        gstep = int(np.asarray(state["step"]))
        if gstep % args.logging_steps == 0:
            loss = float(metrics["loss"])
            dt = time.time() - t0
            print(json.dumps(
                {"step": gstep, "loss": loss, "elapsed_s": round(dt, 1)}
            ))
            if writer:
                writer.add_scalar("distill_loss", loss, gstep)
        if args.checkpointing_steps and gstep % args.checkpointing_steps == 0:
            save_checkpoint(args.output_dir, state, args.checkpoints_total_limit)

    if hasattr(loader, "close"):
        loader.close()
    save_checkpoint(args.output_dir, state, args.checkpoints_total_limit)
    # the serving artifact: adapters only (merge at load via apply_lcm_lora)
    export_safetensors(
        os.path.join(args.output_dir, "lcm_lora.safetensors"),
        {"lcm_lora": state["lcm_lora"]},
    )
    print(json.dumps({"done": True,
                      "final_step": int(np.asarray(state["step"]))}))


if __name__ == "__main__":
    main()
