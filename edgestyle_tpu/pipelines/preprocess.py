"""Try-on preprocessing: photo → six conditioning images, as XLA programs.

Rebuilds /root/reference/extract_dataset.py:353-511 (create_sam_images) and
the pose stage (:214-295):

  1. OpenPose body CNN → keypoints → skeleton conditioning image.
  2. Base SAM prompted with the valid keypoints → coarse person mask →
     bounding box (+20px margin).
  3. Four finetuned mask-decoder heads (subject / agnostic / clothes /
     head) prompted with that box.
  4. Mask algebra: closing+smooth per mask (square-7 for the head),
     union → largest connected component → smooth; unknown =
     agnostic∧clothes removed from both; all masks ∧ person.
  5. Gray-background composites: subject / agnostic / head / clothes
     images + white-on-black agnostic mask.

TPU-first: the image is encoded ONCE and all five prompt/decode passes
reuse the embedding (the reference runs five full ViT encoders per frame,
extract_dataset.py:60-90); morphology and compositing are tensor ops in
the same program.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.models.efficientvit.sam import (
    EfficientViTSam,
    SamConfig,
    SAM_L2,
    postprocess_masks,
    preprocess_sam_image,
)
from edgestyle_tpu.ops.morphology import (
    closing,
    composite_gray,
    largest_component,
    mask_bbox,
    smooth_mask,
)

HEAD_NAMES = ("subject", "agnostic", "clothes", "head")


class PreprocessOutput(NamedTuple):
    subject: jax.Array        # (H,W,3) person on gray
    agnostic: jax.Array       # (H,W,3) person minus clothes on gray
    head: jax.Array           # (H,W,3) head on gray
    clothes: jax.Array        # (H,W,3) clothes on gray
    agnostic_mask: jax.Array  # (H,W) bool
    person_mask: jax.Array    # (H,W) bool
    subject_score: jax.Array  # () float — subject head's predicted IoU
    # (the reference's sam_scores: extract_dataset.py:378-391 gates frames
    # on it at SUBJECT_SCORE_THRESHOLD=0.5 and mixes it into frame
    # ranking at :702)


class TryOnPreprocessor:
    """params: {'sam': base EfficientViTSam params,
               'decoders': {head_name: mask_decoder param subtree}}.
    The four finetuned EdgeStyle heads share the base encoder/prompt
    encoder (only the decoder was trained, segmenter_training_*.py:145-147).
    """

    def __init__(self, cfg: SamConfig = SAM_L2, dtype=jnp.float32):
        self.cfg = cfg
        self.sam = EfficientViTSam(cfg, dtype=dtype)
        self.prompt_scale = cfg.prompt_input_size / cfg.image_size

    def _decode_with(self, params: Dict, decoder_params, embedding, points, labels,
                     multimask: bool):
        p = dict(params["sam"])
        if decoder_params is not None:
            p = {**p, "mask_decoder": decoder_params}
        masks, iou = self.sam.apply(
            {"params": p}, embedding, points, labels,
            method="decode", multimask_output=multimask,
        )
        return masks, iou

    def __call__(self, params: Dict, image01: jax.Array,
                 keypoints: jax.Array) -> PreprocessOutput:
        """image01: (H, W, 3) in [0,1] at the SAM working size (512).
        keypoints: (18, 2) pixel coords in the same frame, NaN = missing."""
        h, w, _ = image01.shape
        img = preprocess_sam_image(image01[None])
        embedding = self.sam.apply({"params": params["sam"]}, img,
                                   method="encode_image")

        # 1. coarse person mask from pose keypoints (base decoder)
        valid = jnp.isfinite(keypoints[:, 0])
        pts = jnp.nan_to_num(keypoints) * self.prompt_scale
        lbl = jnp.where(valid, 1, -1)[None]
        masks, iou = self._decode_with(params, None, embedding, pts[None], lbl, True)
        coarse = postprocess_masks(masks.astype(jnp.float32), (h, w))[0, 0] > 0

        # 2. box prompt (+20px margin, reference getBox)
        box = mask_bbox(coarse, margin=20).astype(jnp.float32) * self.prompt_scale
        bpts = jnp.stack([box[:2], box[2:]])[None]  # (1,2,2)
        blbl = jnp.array([[2, 3]])

        def head_mask(name: str, close_k: int):
            m, iou = self._decode_with(
                params, params["decoders"][name], embedding, bpts, blbl, False
            )
            m = postprocess_masks(m.astype(jnp.float32), (h, w))[0, 0] > 0
            m = smooth_mask(closing(m, 3), 3, 3) if close_k == 3 else smooth_mask(
                closing(m, 7), 3, 3
            )
            return m, iou.reshape(-1)[0]

        subject_m, subject_iou = head_mask("subject", 3)
        agnostic_m, _ = head_mask("agnostic", 3)
        clothes_m, _ = head_mask("clothes", 3)
        head_m, _ = head_mask("head", 7)

        # 3. union → largest CC → smooth (person silhouette)
        all_m = subject_m | clothes_m | head_m
        all_m = smooth_mask(largest_component(all_m), 3, 3)

        # 4. resolve agnostic/clothes overlap, clip to person
        unknown = agnostic_m & clothes_m
        agnostic_f = agnostic_m & ~unknown & all_m
        clothes_f = clothes_m & ~unknown & all_m
        head_f = head_m & all_m

        return PreprocessOutput(
            subject=composite_gray(image01, all_m),
            agnostic=composite_gray(image01, agnostic_f),
            head=composite_gray(image01, head_f),
            clothes=composite_gray(image01, clothes_f),
            agnostic_mask=agnostic_f,
            person_mask=all_m,
            subject_score=subject_iou.astype(jnp.float32),
        )

    def init_params(self, rng) -> Dict:
        img = jnp.zeros((1, self.cfg.image_size, self.cfg.image_size, 3))
        pts = jnp.zeros((1, 2, 2))
        lbl = jnp.array([[2, 3]])
        base = self.sam.init(rng, img, pts, lbl)["params"]
        dec = base["mask_decoder"]
        return {
            "sam": base,
            "decoders": {n: jax.tree.map(jnp.copy, dec) for n in HEAD_NAMES},
        }
