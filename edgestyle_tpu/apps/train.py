"""ControlLoRA training driver — the TPU-native equivalent of
`accelerate launch train_text2image_pretrained_openpose.py`
(/root/reference/train_text2image_pretrained_openpose.py:240-644 flags,
647-1388 main loop).

Differences from the reference, by design:
  * no Accelerate: data parallelism is a jax Mesh + NamedSharding; XLA
    emits the gradient all-reduce;
  * the whole optimization step (grad-accum scan + Prodigy + clipping)
    is ONE jitted program;
  * checkpointing via orbax with the same dedupe/round-trip semantics;
  * TensorBoard logging via tensorboardX (train_loss + Prodigy d as
    train_lr, mirroring train...py:1282-1310), optional
    validation-by-generation grids.

Usage:
  python -m edgestyle_tpu.apps.train --dataset_dir ... \
      --pretrained_model ... --vae ... --openpose_controlnet ... \
      --output_dir ./out --max_train_steps 20000 \
      --train_batch_size 2 --gradient_accumulation_steps 32
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="EdgeStyle-TPU ControlLoRA trainer")
    # model sources
    p.add_argument("--pretrained_model", "--pretrained_model_name_or_path",
                   type=str, default=None, dest="pretrained_model",
                   help="HF-layout dir with unet/ and text_encoder/ "
                        "(reference flag name accepted as alias)")
    p.add_argument("--vae", "--pretrained_vae_name_or_path", type=str,
                   default=None, dest="vae")
    p.add_argument("--openpose_controlnet", "--pretrained_openpose_name_or_path",
                   type=str, default=None, dest="openpose_controlnet")
    p.add_argument("--random_init", action="store_true",
                   help="random-init all weights (smoke tests / benchmarks)")
    # data
    p.add_argument("--dataset_dir", type=str, default=None)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--train_batch_size", type=int, default=2)
    p.add_argument("--gradient_accumulation_steps", type=int, default=32)
    p.add_argument("--proportion_empty_prompts", type=float, default=0.0)
    p.add_argument("--proportion_empty_images", type=float, default=0.0)
    p.add_argument("--proportion_patchworked_images", type=float, default=0.0)
    p.add_argument("--proportion_cutout_images", type=float, default=0.0)
    p.add_argument("--proportion_patchworks", type=float, default=0.0)
    # BooleanOptionalAction keeps both directions reachable (ADVICE r1);
    # default False = head crops, the reference default — its flag is
    # store_true (train...py:559) and the README recipe never sets it, so
    # the published checkpoints were trained on head images.
    p.add_argument("--use_agnostic_images", action=argparse.BooleanOptionalAction,
                   default=False)
    # optimization (reference recipe: prodigy lr 1.0, snr_gamma 5)
    p.add_argument("--optimizer", type=str, default="prodigy", choices=["prodigy", "adamw"])
    p.add_argument("--learning_rate", type=float, default=1.0)
    p.add_argument("--scale_lr", action="store_true", default=False,
                   help="lr *= grad_accum * batch * device_count (train...py:400-407)")
    p.add_argument("--lr_warmup_steps", type=int, default=0)
    p.add_argument("--snr_gamma", type=float, default=5.0)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--adam_beta1", type=float, default=0.9)
    p.add_argument("--adam_beta2", type=float, default=0.999)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--adam_weight_decay", type=float, default=1e-4)
    p.add_argument("--prodigy_beta3", type=float, default=None)
    p.add_argument("--prodigy_decouple", type=_ref_bool, default=True)
    p.add_argument("--prodigy_use_bias_correction", type=_ref_bool, default=True)
    p.add_argument("--prodigy_safeguard_warmup", type=_ref_bool, default=True)
    p.add_argument("--lr_scheduler", type=str, default="cosine_annealing",
                   help="diffusers get_scheduler names; cosine_annealing is "
                        "the legacy alias of cosine")
    p.add_argument("--lr_num_cycles", type=float, default=1.0)
    p.add_argument("--lr_power", type=float, default=1.0)
    p.add_argument("--num_train_epochs", type=int, default=1)
    p.add_argument("--max_train_steps", type=int, default=None,
                   help="None -> num_train_epochs * steps-per-epoch "
                        "(reference train...py:1034-1038)")
    p.add_argument("--max_train_samples", type=int, default=None)
    p.add_argument("--controllora_linear_rank", type=int, default=32)
    p.add_argument("--controllora_conv2d_rank", type=int, default=0,
                   help="adapt trunk convs too; >0 uses the LINEAR rank for "
                        "the adapters (the reference quirk, controllora.py:561-569)")
    p.add_argument("--mixed_precision", type=str, default="bf16",
                   choices=["no", "fp16", "bf16"],
                   help="fp16 runs as bf16 on TPU (no native fp16 compute)")
    p.add_argument("--seed", type=int, default=0)
    # checkpointing / logging
    p.add_argument("--output_dir", type=str, default="./edgestyle-tpu-out")
    p.add_argument("--logging_dir", type=str, default="logs",
                   help="TensorBoard dir relative to --output_dir")
    p.add_argument("--checkpointing_steps", type=int, default=100)
    p.add_argument("--checkpoints_total_limit", type=int, default=5)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    p.add_argument("--validation_steps", type=int, default=0)
    p.add_argument("--num_validation_images", type=int, default=4)
    p.add_argument("--logging_steps", type=int, default=10)
    # accepted for reference-CLI compatibility; no-ops on this stack
    # (HF download plumbing / torch dataloader / accelerate trackers)
    for flag, default in (("--revision", None), ("--variant", None),
                          ("--tokenizer_name", None), ("--cache_dir", None),
                          ("--report_to", "tensorboard"),
                          ("--tracker_project_name", "edgestyle-tpu")):
        p.add_argument(flag, type=str, default=default,
                       help="compat no-op (HF/accelerate plumbing)")
    p.add_argument("--dataloader_num_workers", type=int, default=0,
                   help="thread-pool size for per-example image loads; any "
                        "value > 0 also enables background batch prefetch "
                        "(depth 2) so host collate overlaps device steps "
                        "(the reference DataLoader num_workers analog, "
                        "train...py:426,973)")
    p.add_argument("--gradient_checkpointing", action="store_true",
                   help="remat the per-microbatch loss (jax.checkpoint): "
                        "recompute activations in the backward instead of "
                        "saving them — needed to fit the reference recipe "
                        "bs2 x ga32 @ 512px in one chip's HBM (reference "
                        "flag of the same name)")
    p.add_argument("--allow_tf32", action="store_true",
                   help="compat no-op (TPU matmuls are bf16/fp32 via XLA)")
    p.add_argument("--set_grads_to_none", action="store_true",
                   help="compat no-op (functional grads are always fresh)")
    p.add_argument("--controllora_use_vae", action="store_true", default=True,
                   help="compat: the VAE conditioning embedding is the "
                        "recipe default here (README.md:75) and always on")
    args = p.parse_args(argv)
    if args.resolution % 8 != 0:
        p.error("resolution must be divisible by 8")  # train...py:640-643
    return args


def _ref_bool(v: str) -> bool:
    """Reference-style bool flags take =True/=False values (README.md:84)."""
    return str(v).lower() in ("1", "true", "yes")


def check_batch_divisible(train_batch_size: int, device_count: int) -> None:
    """The micro-batch axis is sharded over the data mesh axis
    (P(None, 'data')), so it must divide evenly — otherwise device_put
    errors opaquely at the first batch (ADVICE r1)."""
    if train_batch_size % device_count != 0:
        raise SystemExit(
            f"--train_batch_size ({train_batch_size}) must be divisible by "
            f"the device count ({device_count}): each device takes "
            f"train_batch_size/device_count samples of every micro-batch. "
            f"Raise --train_batch_size or lower "
            f"--gradient_accumulation_steps to keep the sample budget."
        )


def main(argv=None):
    args = parse_args(argv)
    from edgestyle_tpu.core.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.core.mesh import MeshSpec, make_mesh, replicated
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig
    from edgestyle_tpu.training.checkpoint import (
        export_safetensors,
        load_checkpoint,
        save_checkpoint,
    )
    from edgestyle_tpu.training.train_step import (
        TrainConfig,
        init_trainable,
        make_optimizer,
        make_train_step,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    # fp16 has no native TPU compute path; it runs as bf16 (same dynamic
    # range class as the reference's mixed_precision=fp16 intent)
    dtype = "float32" if args.mixed_precision == "no" else "bfloat16"
    from edgestyle_tpu.models.vae import VAEConfig

    # sample_size must follow --resolution: fusion-block LayerNorm scales
    # are per-pixel (reference hard-codes 512 sizes,
    # edgestyle_multicontrolnet.py:72-102; here they derive from the VAE
    # sample size, so smoke runs at other resolutions init consistently)
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
            lora_rank=args.controllora_linear_rank,
        )

    frozen = {
        "vae": params["vae"],
        "clip": params["clip"],
        "unet": params["unet"],
        "static": params["controlnet"]["static"],
    }
    if dtype == "bfloat16":
        # mixed precision: FROZEN weights are stored bf16 (the reference's
        # fp16 autocast intent; the denoise math already computes in bf16
        # — same convention as bench.py's train config). Trainables stay
        # fp32 master weights for the optimizer. At 512px this halves
        # ~5.7 GB of resident frozen params — without it the bs1 x ga32
        # remat step OOMs at RUNTIME on a 16 GB chip (r5 soak).
        frozen = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p,
            frozen,
        )

    # loop length: explicit max_train_steps, else epochs x steps-per-epoch
    # (reference train...py:1034-1038; synthetic mode has no epoch notion)
    if args.dataset_dir:
        from edgestyle_tpu.data.dataset import EdgeStyleLocalDataset

        n_samples = len(EdgeStyleLocalDataset(args.dataset_dir,
                                              resolution=args.resolution))
        if args.max_train_samples:
            n_samples = min(n_samples, args.max_train_samples)
        steps_per_epoch = max(
            n_samples // (args.train_batch_size * args.gradient_accumulation_steps), 1
        )
    else:
        steps_per_epoch = 1000
    max_train_steps = args.max_train_steps or (
        args.num_train_epochs * steps_per_epoch
    )
    lr = args.learning_rate
    if args.scale_lr:
        lr *= (args.gradient_accumulation_steps * args.train_batch_size
               * jax.device_count())

    tcfg = TrainConfig(
        snr_gamma=args.snr_gamma,
        max_grad_norm=args.max_grad_norm,
        remat=args.gradient_checkpointing,
        optimizer=args.optimizer,
        learning_rate=lr,
        adam_beta1=args.adam_beta1,
        adam_beta2=args.adam_beta2,
        adam_epsilon=args.adam_epsilon,
        lr_scheduler=args.lr_scheduler,
        lr_warmup_steps=args.lr_warmup_steps,
        lr_total_steps=(
            None if args.lr_scheduler in ("constant", "constant_with_warmup")
            else max_train_steps
        ),
        lr_num_cycles=args.lr_num_cycles,
        lr_power=args.lr_power,
        prodigy_beta3=args.prodigy_beta3,
        prodigy_decouple=args.prodigy_decouple,
        prodigy_use_bias_correction=args.prodigy_use_bias_correction,
        prodigy_safeguard_warmup=args.prodigy_safeguard_warmup,
        weight_decay=args.adam_weight_decay,
        use_agnostic=args.use_agnostic_images,
        grad_accum=args.gradient_accumulation_steps,
    )
    trainable = init_trainable(pipe, rng, params["unet"],
                               args.controllora_linear_rank,
                               args.controllora_conv2d_rank)
    # free the fp32 originals: `frozen` (bf16) is the training-time copy,
    # and keeping both is ~7 GB of dead HBM at full size — enough to tip
    # the 512px remat step into runtime ResourceExhausted (r5 soak;
    # bench.py's train config always did the same `del`)
    del params
    opt = make_optimizer(tcfg)
    state = {
        "trainable": trainable,
        "opt_state": opt.init(trainable),
        "step": jnp.zeros([], jnp.int32),
    }
    if args.resume_from_checkpoint:
        state = load_checkpoint(
            args.output_dir, state,
            "latest" if args.resume_from_checkpoint == "latest" else int(args.resume_from_checkpoint),
        )

    # data parallel placement
    check_batch_divisible(args.train_batch_size, jax.device_count())
    mesh = make_mesh(MeshSpec(data=jax.device_count()))
    repl = replicated(mesh)
    batch_sh = NamedSharding(mesh, P(None, "data"))
    state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    frozen = jax.tree.map(lambda x: jax.device_put(x, repl), frozen)

    step_fn = jax.jit(make_train_step(pipe, tcfg))

    # data source
    if args.dataset_dir:
        from edgestyle_tpu.data.dataset import EdgeStyleLocalDataset, data_loader

        ds = EdgeStyleLocalDataset(args.dataset_dir, resolution=args.resolution)
        if args.max_train_samples:
            ds.index = ds.index[: args.max_train_samples]
        loader = data_loader(
            ds, args.train_batch_size * args.gradient_accumulation_steps,
            args.gradient_accumulation_steps, seed=args.seed,
            proportions=dict(
                proportion_empty_prompts=args.proportion_empty_prompts,
                proportion_empty_images=args.proportion_empty_images,
                proportion_patchworked_images=args.proportion_patchworked_images,
                proportion_cutout_images=args.proportion_cutout_images,
                proportion_patchworks=args.proportion_patchworks,
            ),
            num_workers=args.dataloader_num_workers,
        )
    else:
        loader = _synthetic_loader(args)
    if args.dataloader_num_workers > 0:
        # overlap host collate/augment with device steps (bounded queue so
        # the infinite source can't run ahead unboundedly)
        from edgestyle_tpu.data.prefetch import prefetch

        loader = prefetch(loader, depth=2)

    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(os.path.join(args.output_dir, args.logging_dir))
    except Exception:
        writer = None

    t0 = time.time()
    for step_i, batch in enumerate(loader):
        if int(np.asarray(state["step"])) >= max_train_steps:
            break
        batch = jax.tree.map(lambda x: jax.device_put(x, batch_sh), batch)
        rng, r = jax.random.split(rng)
        state, metrics = step_fn(state, frozen, batch, r)
        gstep = int(np.asarray(state["step"]))
        if gstep % args.logging_steps == 0:
            loss = float(metrics["loss"])
            d = float(metrics["d"])
            dt = time.time() - t0
            print(json.dumps({"step": gstep, "loss": loss, "d": d, "elapsed_s": round(dt, 1)}))
            if writer:
                writer.add_scalar("train_loss", loss, gstep)
                writer.add_scalar("train_lr", d, gstep)
        if args.checkpointing_steps and gstep % args.checkpointing_steps == 0:
            save_checkpoint(args.output_dir, state, args.checkpoints_total_limit)
        if args.validation_steps and gstep % args.validation_steps == 0 and writer:
            from edgestyle_tpu.training.validation import log_validation

            val_batch = jax.tree.map(
                lambda x: np.asarray(x[0][: args.num_validation_images]), batch
            )  # first microbatch, capped at num_validation_images
            host_trainable = jax.device_get(state["trainable"])
            log_validation(
                pipe, frozen, host_trainable, val_batch, gstep, writer,
                num_inference_steps=8,
                use_agnostic=args.use_agnostic_images,
                # reference sweep: linspace(3.0, 7.5, num_validation_images)
                # (train...py:146)
                guidance_scales=tuple(
                    np.linspace(3.0, 7.5, args.num_validation_images)
                ),
            )

    if hasattr(loader, "close"):
        loader.close()  # stop the prefetch producer (infinite source)
    save_checkpoint(args.output_dir, state, args.checkpoints_total_limit)
    export_safetensors(
        os.path.join(args.output_dir, "edgestyle_trainable.safetensors"),
        state["trainable"],
    )
    # reference-layout final save (train...py:1373-1382): consumable by the
    # reference torch stack (fusion + controlnet_0/1 subsets)
    from edgestyle_tpu.core.pretrained import export_reference_layout

    export_reference_layout(
        os.path.join(args.output_dir, "controlnet"),
        jax.device_get(state["trainable"]),
        unet_conv_in=jax.device_get(frozen["unet"]["conv_in"]),
    )
    print(json.dumps({"done": True, "final_step": int(np.asarray(state["step"]))}))


def _synthetic_loader(args):
    """Random batches (smoke-test mode when no dataset is given)."""
    g = np.random.default_rng(args.seed)
    accum, mb = args.gradient_accumulation_steps, args.train_batch_size
    res = args.resolution

    def gen():
        while True:
            img = lambda: g.standard_normal(
                (accum, mb, res, res, 3)
            ).astype(np.float32) * 0.2
            yield {
                "original": img(), "agnostic": img(), "head": img(), "clothes": img(),
                "clothes2": img(), "original_openpose": np.abs(img()),
                "clothes_openpose": np.abs(img()), "clothes_openpose2": np.abs(img()),
                "input_ids": g.integers(1, 49000, (accum, mb, 77)).astype(np.int32),
            }

    return gen()


if __name__ == "__main__":
    main()
