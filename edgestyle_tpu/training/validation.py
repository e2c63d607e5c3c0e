"""Validation-by-generation (reference log_validation,
/root/reference/train_text2image_pretrained_openpose.py:66-219): every N
steps, run the full try-on pipeline with the current trainable weights at
several guidance scales and log ground truth + conditioning + generations
as an image grid to TensorBoard."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# reference log_validation sweeps guidance = linspace(3.0, 7.5,
# num_validation_images) (train...py:146,152); 4 images by default
VALIDATION_GUIDANCE_SCALES = (3.0, 4.5, 6.0, 7.5)


def assemble_inference_params(frozen: Dict, trainable: Dict) -> Dict:
    """frozen {vae, clip, unet, static} + trainable {lora_*, heads_*,
    fusion} → pipeline params dict (merging LoRA into tied trunks)."""
    from edgestyle_tpu.models.unet import controllora_params

    return {
        "vae": frozen["vae"],
        "clip": frozen["clip"],
        "unet": frozen["unet"],
        "controlnet": {
            "static": frozen["static"],
            "lora_0": controllora_params(frozen["unet"], trainable["lora_0"], trainable["heads_0"]),
            "lora_1": controllora_params(frozen["unet"], trainable["lora_1"], trainable["heads_1"]),
            "fusion": trainable["fusion"],
        },
    }


def log_validation(
    pipe,
    frozen: Dict,
    trainable: Dict,
    batch: Dict[str, np.ndarray],
    step: int,
    writer=None,
    guidance_scales: Sequence[float] = VALIDATION_GUIDANCE_SCALES,
    num_inference_steps: int = 20,
    rng: Optional[jax.Array] = None,
    use_agnostic: bool = False,
):
    """batch: one collated validation batch (micro-batch shapes, no accum
    axis). Returns the grid (H, W_total, 3) float32 [0,1].

    ``use_agnostic`` mirrors the trainer's --use_agnostic_images: branch 0
    sees agnostic or head crops (reference train...py:109-112 picks the
    same source for its validation grids)."""
    params = assemble_inference_params(frozen, trainable)
    rng = rng if rng is not None else jax.random.key(0)
    first = batch["agnostic"] if use_agnostic else batch["head"]
    cond = [
        jnp.asarray(first),
        jnp.asarray(batch["original_openpose"]),
        jnp.asarray(batch["clothes"]),
        jnp.asarray(batch["clothes_openpose"]),
        jnp.asarray(batch["clothes2"]),
        jnp.asarray(batch["clothes_openpose2"]),
    ]
    ids = jnp.asarray(batch["input_ids"])
    neg = jnp.zeros_like(ids)

    rows = [np.asarray(batch["original"] / 2 + 0.5).clip(0, 1)]
    rows += [np.asarray(first / 2 + 0.5).clip(0, 1),
             np.asarray(batch["original_openpose"]).clip(0, 1)]
    for g in guidance_scales:
        out = pipe(
            params, ids, neg, cond, rng=rng,
            num_inference_steps=num_inference_steps, guidance_scale=g,
        )
        rows.append(np.asarray(out))

    grid = np.concatenate([np.concatenate(list(r), axis=1) for r in rows], axis=0)
    if writer is not None:
        writer.add_image("validation", grid, step, dataformats="HWC")
    return grid
