"""The north-star program: raw photos → try-on image in ONE XLA program.

BASELINE.json: "Preprocessing (mask extraction, agnostic-image
compositing, pose rendering) fuses into the same XLA program so a single
pmap-able call goes from raw source/target photos to a decoded try-on
image."

`tryon_from_photos` jits exactly that: given the three 512px photos and
their pose keypoints (pose *detection* needs a ~µs irregular host merge —
see models/openpose.assemble_people_host — so keypoints enter as inputs;
everything else, including the pose *rendering*, runs in-graph):

  photos (3×HxWx3) ─┬─ SAM encode ×3 (batched) ─ 4 decode heads ─ morphology
                    │                               └ composites (agnostic/clothes)
  keypoints (3×18×2)┴─ render_pose ×3 (distance fields)
                    → six conditioning images → CLIP → UniPC scan → VAE decode

Because it is one program, it is trivially `jax.vmap`/`pmap`-able over a
leading batch axis and shardable over the `data` mesh axis.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from edgestyle_tpu.models.openpose import render_pose
from edgestyle_tpu.pipelines.preprocess import TryOnPreprocessor
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline


class FusedTryOn:
    """Bundle of preprocessor + pipeline with a single jitted program.

    params: {'sam': ..., 'decoders': ..., 'gen': <EdgeStylePipeline params>}
    """

    def __init__(self, preproc: TryOnPreprocessor, pipe: EdgeStylePipeline,
                 use_agnostic: bool = False):
        self.preproc = preproc
        self.pipe = pipe
        # branch-0 cond: head crop by default — the reference's
        # --use_agnostic_images is store_true and its README recipe never
        # sets it (train...py:559, inference.py:294)
        self.use_agnostic = use_agnostic

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=("num_inference_steps",))
    def __call__(
        self,
        params: Dict,
        subject01: jax.Array,      # (H, W, 3) in [0,1]
        clothes1_01: jax.Array,
        clothes2_01: jax.Array,
        keypoints: jax.Array,      # (3, 18, 2) px coords, NaN = missing
        prompt_ids: jax.Array,     # (1, 77)
        negative_prompt_ids: jax.Array,
        rng: jax.Array,
        num_inference_steps: int = 20,
        guidance_scale=3.5,
    ) -> jax.Array:
        h, w, _ = subject01.shape

        # --- masks: one shared-encoder preprocess per photo (in-graph)
        ex_s = self.preproc(params, subject01, keypoints[0])
        ex_1 = self.preproc(params, clothes1_01, keypoints[1])
        ex_2 = self.preproc(params, clothes2_01, keypoints[2])

        # --- pose conditioning images rendered in-graph
        kp01 = keypoints / jnp.asarray([w, h], jnp.float32)
        pose_s = render_pose(kp01[0], (h, w))
        pose_1 = render_pose(kp01[1], (h, w))
        pose_2 = render_pose(kp01[2], (h, w))

        to_norm = lambda a: (a * 2.0 - 1.0)[None]
        to01 = lambda a: a[None]
        cond = [
            to_norm(ex_s.agnostic if self.use_agnostic else ex_s.head),
            to01(pose_s),
            to_norm(ex_1.clothes), to01(pose_1),
            to_norm(ex_2.clothes), to01(pose_2),
        ]
        return self.pipe._generate(
            params["gen"], prompt_ids, negative_prompt_ids, cond, rng,
            num_inference_steps, guidance_scale, None, None, False,
        )
