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
        if os.path.isdir(edgestyle_checkpoint):
            # reference-layout trained checkpoint (controlnet_0/1 subdirs)
            tr = load_edgestyle_pretrained_dir(edgestyle_checkpoint)
        else:
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


# ----------------------------------------------------- reference EdgeStyle
# The reference trainer's final save (train_text2image_pretrained_openpose
# .py:1373-1382 + EdgeStyleMultiControlNetModel.save_pretrained,
# edgestyle_multicontrolnet.py:213-282) is a directory:
#   diffusion_pytorch_model.safetensors      fusion blocks only (:173-193)
#   controlnet_0/diffusion_pytorch_model.safetensors   ControlLoRA "A"
#   controlnet_1/diffusion_pytorch_model.safetensors   ControlLoRA "B"
# where each ControlLoRA file holds only non-tied modules + ".lora_layer."
# weights (controllora.py:600-606). These loaders port that layout into
# this framework's trainable trees so a reference-trained checkpoint runs
# here unchanged.


def _map_fusion_block(m, base: str, tgt: str):
    for conv in ("first_conv", "second_conv", "third_conv"):
        m.conv(base + rf"\.{conv}", f"{tgt}.{conv}")
    for ln in ("first_normalization", "second_normalization"):
        # torch nn.LayerNorm([C,H,W]) params → NHWC (H,W,C)
        m.rule(base + rf"\.{ln}\.weight", f"{tgt}.{ln}.scale",
               lambda w: np.transpose(np.asarray(w), (1, 2, 0)))
        m.rule(base + rf"\.{ln}\.bias", f"{tgt}.{ln}.bias",
               lambda w: np.transpose(np.asarray(w), (1, 2, 0)))
    return m


def port_fusion_state_dict(sd) -> Dict:
    """Reference EdgeStyleMultiControlNetModel.state_dict() → fusion tree."""
    m = porting.KeyMapper()
    for k in range(12):
        _map_fusion_block(m, rf"multi_controlnet_down_blocks\.{k}",
                          f"multi_controlnet_down_blocks_{k}")
    _map_fusion_block(m, r"multi_controlnet_mid_block",
                      "multi_controlnet_mid_block")
    return porting.unflatten(m.apply(sd))


def port_controllora_state_dict(sd):
    """Reference ControlLoRAModel.state_dict() (non-tied + lora subset) →
    (lora tree {path: {down,up}}, zero-conv heads tree).

    The tied trunk is absent by construction (tying here is structural:
    the same UNet subtree is passed at assembly); the cond-embedding
    conv_unet keys duplicate the tied UNet conv_in and are dropped."""
    from edgestyle_tpu.models.unet import _unet_common_mapper

    lora_sd = {k: v for k, v in sd.items() if ".lora_layer." in k}
    rest = {
        k: v for k, v in sd.items()
        if ".lora_layer." not in k
        and not k.startswith("controlnet_cond_embedding.")
    }

    m = porting.KeyMapper()
    for k in range(12):
        m.conv(rf"controlnet_down_blocks\.{k}", f"controlnet_down_blocks_{k}")
    m.conv(r"controlnet_mid_block", "controlnet_mid_block")
    heads = porting.unflatten(m.apply(rest))

    trunk_m = _unet_common_mapper(porting.KeyMapper())
    lora_flat: Dict[str, np.ndarray] = {}
    for k, v in lora_sd.items():
        base, tail = k.split(".lora_layer.", 1)
        which = tail.split(".")[0]  # 'down' | 'up'
        if which not in ("down", "up"):
            raise KeyError(f"unexpected lora key {k}")
        synth = base + ".weight"
        for pat, template, _ in trunk_m.rules:
            mm = pat.fullmatch(synth)
            if mm:
                flax_key = mm.expand(template)
                break
        else:
            raise KeyError(f"no trunk mapping for lora base {base!r}")
        if not flax_key.endswith(".kernel"):
            raise KeyError(f"lora base {base!r} is not a kernel target")
        # adapter tree is keyed by the FULL kernel path (init_lora_params).
        # linear — torch: down (r,in), up (out,r); ours: down (in,r), up (r,out).
        # conv (LoRAConv2dLayer, conv2d_rank>0) — torch: down k×k conv
        # (r,in,kh,kw), up 1×1 conv (out,r,1,1); ours: down (kh,kw,in,r)
        # HWIO, up (r,out).
        v = np.asarray(v)
        if v.ndim == 4:
            t = (np.transpose(v, (2, 3, 1, 0)) if which == "down"
                 else v[:, :, 0, 0].T)
        else:
            t = v.T
        lora_flat[f"{flax_key}.{which}"] = np.ascontiguousarray(t)
    return porting.unflatten(lora_flat), heads


def load_edgestyle_pretrained_dir(path: str) -> Dict:
    """Load a reference-layout trained-EdgeStyle directory into the
    trainable tree {lora_0, heads_0, lora_1, heads_1, fusion}."""
    from safetensors.numpy import load_file

    out: Dict = {"fusion": port_fusion_state_dict(
        load_file(_find_weights(path)))}
    for i in (0, 1):
        sub = os.path.join(path, f"controlnet_{i}")
        lora, heads = port_controllora_state_dict(load_file(_find_weights(sub)))
        out[f"lora_{i}"] = lora
        out[f"heads_{i}"] = heads
    return out


def _trunk_inverse_index() -> Dict[str, str]:
    """flax trunk kernel path → torch module base, built by running a
    generated torch-key grammar through the forward mapper (no inverse
    regexes to maintain)."""
    from edgestyle_tpu.models.unet import _unet_common_mapper

    cands = ["time_embedding.linear_1", "time_embedding.linear_2", "conv_in"]
    def attn_unit(base):
        out = []
        for a in ("attn1", "attn2"):
            out += [f"{base}.{a}.{t}" for t in ("to_q", "to_k", "to_v")]
            out.append(f"{base}.{a}.to_out.0")
        out += [f"{base}.ff.net.0.proj", f"{base}.ff.net.2"]
        return out

    for i in range(4):
        for j in range(3):
            ab = f"down_blocks.{i}.attentions.{j}"
            cands += [f"{ab}.proj_in", f"{ab}.proj_out"]
            rb = f"down_blocks.{i}.resnets.{j}"
            cands.append(f"{rb}.time_emb_proj")
            # conv-LoRA targets (--controllora_conv2d_rank>0): every trunk
            # conv is LoRACompatibleConv in the reference (controllora.py:561)
            cands += [f"{rb}.conv1", f"{rb}.conv2", f"{rb}.conv_shortcut"]
            for k in range(2):
                cands += attn_unit(f"{ab}.transformer_blocks.{k}")
        cands.append(f"down_blocks.{i}.downsamplers.0.conv")
    for j in range(2):
        cands += [f"mid_block.resnets.{j}.conv1", f"mid_block.resnets.{j}.conv2",
                  f"mid_block.resnets.{j}.conv_shortcut"]
    cands += ["mid_block.attentions.0.proj_in", "mid_block.attentions.0.proj_out",
              "mid_block.resnets.0.time_emb_proj", "mid_block.resnets.1.time_emb_proj"]
    for k in range(2):
        cands += attn_unit(f"mid_block.attentions.0.transformer_blocks.{k}")

    m = _unet_common_mapper(porting.KeyMapper())
    inverse: Dict[str, str] = {}
    for base in cands:
        synth = base + ".weight"
        for pat, template, _ in m.rules:
            mm = pat.fullmatch(synth)
            if mm:
                inverse[mm.expand(template)] = base
                break
    return inverse


def export_reference_layout(path: str, trainable: Dict, unet_conv_in=None) -> str:
    """Write the trainable set in the REFERENCE's final-save layout
    (train...py:1373-1382) so a reference-stack user can consume training
    done here: fusion safetensors at the top + controlnet_{0,1}/ subdirs
    holding the non-tied + lora subsets. Exact inverse of
    load_edgestyle_pretrained_dir (round-trip asserted in tests).

    `unet_conv_in`: optional {'kernel','bias'} of the tied UNet conv_in —
    included as controlnet_cond_embedding.conv_vae_out.* (the reference's
    VAEControlNetConditioningEmbedding attribute, controllora.py:36 — the
    same Parameter object as the tied conv_in) so the reference's strict
    load_state_dict finds every non-tied key."""
    from safetensors.numpy import save_file

    def inv_conv(k):  # HWIO → OIHW
        return np.ascontiguousarray(np.transpose(np.asarray(k), (3, 2, 0, 1)))

    os.makedirs(path, exist_ok=True)
    fusion_sd: Dict[str, np.ndarray] = {}
    for blk_name, blk in trainable["fusion"].items():
        tname = blk_name.replace("multi_controlnet_down_blocks_",
                                 "multi_controlnet_down_blocks.")
        for sub, p in blk.items():
            if sub.endswith("_conv"):
                fusion_sd[f"{tname}.{sub}.weight"] = inv_conv(p["kernel"])
                fusion_sd[f"{tname}.{sub}.bias"] = np.asarray(p["bias"])
            else:  # full-extent LayerNorm: (H,W,C) → (C,H,W)
                fusion_sd[f"{tname}.{sub}.weight"] = np.ascontiguousarray(
                    np.transpose(np.asarray(p["scale"]), (2, 0, 1)))
                fusion_sd[f"{tname}.{sub}.bias"] = np.ascontiguousarray(
                    np.transpose(np.asarray(p["bias"]), (2, 0, 1)))
    save_file(fusion_sd, os.path.join(path, "diffusion_pytorch_model.safetensors"),
              metadata={"format": "pt"})

    inverse = _trunk_inverse_index()
    for i in (0, 1):
        sd: Dict[str, np.ndarray] = {}
        for hname, p in trainable[f"heads_{i}"].items():
            tname = hname.replace("controlnet_down_blocks_",
                                  "controlnet_down_blocks.")
            sd[f"{tname}.weight"] = inv_conv(p["kernel"])
            sd[f"{tname}.bias"] = np.asarray(p["bias"])
        flat = porting.flatten(trainable[f"lora_{i}"])
        for key, v in flat.items():
            if key.endswith(".down") or key.endswith(".up"):
                flax_kernel, which = key.rsplit(".", 1)
                base = inverse.get(flax_kernel)
                if base is None:
                    raise KeyError(f"no torch mapping for lora path {flax_kernel}")
                v = np.asarray(v)
                is_conv = flat[f"{flax_kernel}.down"].ndim == 4
                if is_conv:
                    # diffusers LoRAConv2dLayer: down k×k conv (r,in,kh,kw),
                    # up 1×1 conv (out,r,1,1); ours: down (kh,kw,in,r)
                    # HWIO, up (r,out)
                    t = (np.transpose(v, (3, 2, 0, 1)) if which == "down"
                         else v.T[:, :, None, None])
                else:
                    # linear: ours down (in,r), up (r,out) → torch (r,in)/(out,r)
                    t = v.T
                sd[f"{base}.lora_layer.{which}.weight"] = np.ascontiguousarray(t)
            else:
                raise KeyError(f"unexpected lora leaf {key}")
        if unet_conv_in is not None:
            sd["controlnet_cond_embedding.conv_vae_out.weight"] = inv_conv(
                unet_conv_in["kernel"])
            sd["controlnet_cond_embedding.conv_vae_out.bias"] = np.asarray(
                unet_conv_in["bias"])
        sub = os.path.join(path, f"controlnet_{i}")
        os.makedirs(sub, exist_ok=True)
        save_file(sd, os.path.join(sub, "diffusion_pytorch_model.safetensors"),
                  metadata={"format": "pt"})
    return path
