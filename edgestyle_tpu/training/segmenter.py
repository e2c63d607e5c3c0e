"""SAM mask-decoder finetuning — the reference's four segmenter trainers
(/root/reference/segmenter_training_{subject,head,clothes,body}.py) in one
parameterized TPU program.

Reference semantics mirrored:
  * freeze image encoder + prompt encoder, train ONLY the mask decoder
    (segmenter_training_subject.py:145-147);
  * box prompts derived from the GT mask with random ±30px jitter
    (getBox :167-182);
  * binary target = membership of the parsing label in the head's
    KEEP_CATEGORIES subset, morphologically smoothed (apply_conditions
    :230-243); subsets per head :62 across the four scripts;
  * DiceCE loss (monai DiceCELoss equivalent: soft-Dice + BCE, :126-130);
  * Prodigy lr=1.0 (:385-394).

TPU-first: the frozen encoder forward runs under stop_gradient inside the
same jitted step; all four heads can be trained from one cached embedding
batch if desired (train_step trains one head; see also
pipelines/preprocess.TryOnPreprocessor for shared-encoder inference).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import optax

from edgestyle_tpu.models.efficientvit.sam import EfficientViTSam, postprocess_masks
from edgestyle_tpu.ops.morphology import mask_bbox, smooth_mask
from edgestyle_tpu.training.prodigy import prodigy

# mattmdjaga/human_parsing_dataset label subsets (reference scripts' KEEP_CATEGORIES)
KEEP_CATEGORIES = {
    "subject": tuple(range(1, 18)),
    "head": (1, 2, 3, 11),
    "clothes": (4, 5, 6, 7, 8, 17),
    "body": (1, 2, 3, 9, 10, 11, 12, 13, 14, 15, 17),
}


@dataclasses.dataclass(frozen=True)
class SegmenterTrainConfig:
    head: str = "subject"
    learning_rate: float = 1.0
    box_jitter: int = 30
    smooth_target: bool = True


def binary_target(parsing_labels: jax.Array, head: str) -> jax.Array:
    """(B, H, W) int parsing map → (B, H, W) bool membership mask."""
    cats = jnp.asarray(KEEP_CATEGORIES[head])
    return jnp.any(parsing_labels[..., None] == cats, axis=-1)


def dice_ce_loss(logits: jax.Array, target: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Soft-Dice + BCE on sigmoid probabilities (monai DiceCELoss with
    sigmoid=True), mean over batch."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = target.astype(jnp.float32)
    axes = tuple(range(1, p.ndim))
    inter = jnp.sum(p * t, axis=axes)
    dice = 1.0 - (2 * inter + eps) / (jnp.sum(p, axes) + jnp.sum(t, axes) + eps)
    bce = jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits.astype(jnp.float32), t), axis=axes
    )
    return jnp.mean(dice + bce)


def jittered_box(mask: jax.Array, rng: jax.Array, jitter: int, prompt_scale: float):
    """GT mask → box prompt points/labels with uniform ±jitter noise
    (reference getBox :167-182; margin 0 there — the +20 margin is only in
    dataset extraction)."""
    box = mask_bbox(mask, margin=0).astype(jnp.float32)
    noise = jax.random.randint(rng, (4,), -jitter, jitter + 1).astype(jnp.float32)
    h, w = mask.shape
    box = jnp.clip(box + noise, 0.0, jnp.asarray([w, h, w, h], jnp.float32))
    box = box * prompt_scale
    pts = jnp.stack([box[:2], box[2:]])
    lbl = jnp.asarray([2, 3])
    return pts, lbl


def make_segmenter_train_step(sam: EfficientViTSam, cfg: SegmenterTrainConfig):
    """Returns train_step(state, frozen_params, batch, rng) → (state, metrics).

    state: {decoder, opt_state, step}; frozen_params: full SAM params
    (encoder + prompt encoder frozen; the decoder inside is unused).
    batch: {'image': (B,512,512,3) SAM-normalized, 'labels': (B,512,512) int32}.
    """
    opt = prodigy(learning_rate=cfg.learning_rate, weight_decay=0.0)
    prompt_scale = sam.cfg.prompt_input_size / sam.cfg.image_size

    def loss_fn(decoder, frozen, batch, rng):
        image, labels = batch["image"], batch["labels"]
        b, h, w, _ = image.shape
        target = binary_target(labels, cfg.head)
        if cfg.smooth_target:
            target = jax.vmap(lambda m: smooth_mask(m, 3, 1))(target)

        emb = jax.lax.stop_gradient(
            sam.apply({"params": frozen}, image, method="encode_image")
        )
        rngs = jax.random.split(rng, b)
        pts, lbls = jax.vmap(
            lambda m, r: jittered_box(m, r, cfg.box_jitter, prompt_scale)
        )(target, rngs)

        params = {**frozen, "mask_decoder": decoder}
        masks, iou = sam.apply(
            {"params": params}, emb, pts, lbls, method="decode",
            multimask_output=False,
        )
        logits = postprocess_masks(masks.astype(jnp.float32), (h, w))[:, 0]
        loss = dice_ce_loss(logits, target)
        return loss, {"loss": loss}

    grad_fn = jax.grad(loss_fn, has_aux=True)

    def train_step(state, frozen, batch, rng):
        grads, aux = grad_fn(state["decoder"], frozen, batch, rng)
        updates, opt_state = opt.update(grads, state["opt_state"], state["decoder"])
        decoder = optax.apply_updates(state["decoder"], updates)
        return (
            {"decoder": decoder, "opt_state": opt_state, "step": state["step"] + 1},
            aux,
        )

    return train_step


def init_segmenter_state(sam_params: Dict, cfg: SegmenterTrainConfig):
    decoder = jax.tree.map(jnp.copy, sam_params["mask_decoder"])
    opt = prodigy(learning_rate=cfg.learning_rate, weight_decay=0.0)
    return {
        "decoder": decoder,
        "opt_state": opt.init(decoder),
        "step": jnp.zeros([], jnp.int32),
    }
