"""Assemble full pipeline params from HF-layout checkpoint directories.

The reference loads (SURVEY.md §2.6):
  * SG161222/Realistic_Vision_V5.1_noVAE — unet/ + text_encoder/ + tokenizer/
  * stabilityai/sd-vae-ft-mse — vae
  * lllyasviel/control_v11p_sd15_openpose — frozen ControlNet

Given local copies of those (diffusers directory layout with
`diffusion_pytorch_model.safetensors` / `model.safetensors`), this builds
the pipeline params dict. Pure host-side; no network access.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

from edgestyle_tpu.core import porting


def _find_weights(path: str) -> str:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "model.safetensors",
        "pytorch_model.safetensors",
    ):
        p = os.path.join(path, name)
        if os.path.isfile(p):
            return p
    if os.path.isfile(path):
        return path
    raise FileNotFoundError(f"no safetensors weights under {path}")


def load_vae_params(path: str) -> Dict:
    from edgestyle_tpu.models.vae import port_vae_state_dict

    sd = porting.load_safetensors(_find_weights(path))
    return porting.unflatten(port_vae_state_dict(sd))


def load_clip_text_params(path: str, num_layers: int = 12) -> Dict:
    from edgestyle_tpu.models.clip_text import port_clip_text_state_dict

    sd = porting.load_safetensors(_find_weights(path))
    return porting.unflatten(port_clip_text_state_dict(sd, num_layers))


def load_clip_model_params(
    path: str, text_layers: int = 12, vision_layers: int = 24
) -> Dict:
    """Full CLIPModel checkpoint (openai/clip-vit-large-patch14 layout,
    dual tower + projections — the reference's prompt-mining model,
    inference.py:98-99) → {"text": ..., "vision": ...} params for
    CLIPTextModelWithProjection / CLIPVisionModelWithProjection."""
    from edgestyle_tpu.models.clip_text import port_clip_text_state_dict
    from edgestyle_tpu.models.clip_vision import port_clip_vision_state_dict

    sd = porting.load_safetensors(_find_weights(path))
    text_flat = {
        "text_model." + k: v
        for k, v in port_clip_text_state_dict(
            {k: v for k, v in sd.items() if k.startswith("text_model.")},
            text_layers,
        ).items()
    }
    text_flat["text_projection.kernel"] = porting.linear_kernel(
        sd["text_projection.weight"]
    )
    vision_flat = port_clip_vision_state_dict(
        {
            k: v
            for k, v in sd.items()
            if k.startswith(("vision_model.", "visual_projection"))
        },
        vision_layers,
    )
    return {
        "text": porting.unflatten(text_flat),
        "vision": porting.unflatten(vision_flat),
    }


def load_unet_params(path: str) -> Dict:
    from edgestyle_tpu.models.unet import port_unet_state_dict

    sd = porting.load_safetensors(_find_weights(path))
    return porting.unflatten(port_unet_state_dict(sd))


def load_controlnet_params(path: str) -> Dict:
    from edgestyle_tpu.models.unet import port_controlnet_state_dict

    sd = porting.load_safetensors(_find_weights(path))
    return porting.unflatten(port_controlnet_state_dict(sd))


def load_pipeline_params(
    pretrained_model_dir: str,
    vae_dir: str,
    openpose_controlnet_dir: str,
    edgestyle_checkpoint: Optional[str] = None,
    lora_rank: int = 32,
    rng: Optional[jax.Array] = None,
) -> Dict:
    """Build the EdgeStylePipeline params dict from HF-layout directories.

    `edgestyle_checkpoint`: optional safetensors of the trained trainable
    set (lora_0/lora_1/heads_0/heads_1/fusion, as exported by
    training.checkpoint.export_safetensors); absent → fresh adapters."""
    from edgestyle_tpu.models.unet import controllora_params

    unet_p = load_unet_params(os.path.join(pretrained_model_dir, "unet"))
    clip_p = load_clip_text_params(os.path.join(pretrained_model_dir, "text_encoder"))
    vae_p = load_vae_params(vae_dir)
    static_p = load_controlnet_params(openpose_controlnet_dir)

    if edgestyle_checkpoint:
        from edgestyle_tpu.training.checkpoint import import_safetensors

        tr = import_safetensors(edgestyle_checkpoint)
        lora0, lora1 = tr["lora_0"], tr["lora_1"]
        heads0, heads1 = tr["heads_0"], tr["heads_1"]
        fusion = tr["fusion"]
    else:
        from edgestyle_tpu.models.multicontrolnet import EdgeStyleMultiControlNet
        from edgestyle_tpu.models.unet import init_lora_params, split_trunk_params

        rng = rng if rng is not None else jax.random.key(0)
        k = jax.random.split(rng, 3)
        trunk = split_trunk_params(unet_p)
        lora0 = init_lora_params(k[0], trunk, lora_rank)
        lora1 = init_lora_params(k[1], trunk, lora_rank)
        heads0 = {
            kk: v for kk, v in static_p.items() if kk.startswith("controlnet_down")
            or kk == "controlnet_mid_block"
        }
        heads0 = jax.tree.map(lambda x: np.zeros_like(np.asarray(x)), heads0)
        heads1 = jax.tree.map(np.copy, heads0)
        fusion = EdgeStyleMultiControlNet().init_fusion(k[2])

    return {
        "vae": vae_p,
        "clip": clip_p,
        "unet": unet_p,
        "controlnet": {
            "static": static_p,
            "lora_0": controllora_params(unet_p, lora0, heads0),
            "lora_1": controllora_params(unet_p, lora1, heads1),
            "fusion": fusion,
        },
    }
