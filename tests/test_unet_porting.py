"""Port-mapper coverage test: build the complete diffusers-convention key
list for the SD1.5 UNet/ControlNet, run the mappers, and assert an exact
bijection with our flax param tree (every torch key consumed, every flax
leaf produced, shapes consistent after transposition)."""

import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.unet import (
    SD15UNet,
    port_controlnet_state_dict,
    port_unet_state_dict,
)


def _torch_shape(flax_path, shape):
    leaf = flax_path.split(".")[-1]
    if leaf == "kernel":
        if len(shape) == 4:  # HWIO → OIHW
            return (shape[3], shape[2], shape[0], shape[1])
        return (shape[1], shape[0])
    return tuple(shape)


def _diffusers_name(flax_path: str) -> str:
    """Our flax path → the diffusers torch key (inverse of the mappers)."""
    p = flax_path
    p = p.replace("down_blocks_", "down_blocks.").replace("up_blocks_", "up_blocks.")
    p = p.replace(".resnets_", ".resnets.").replace(".attentions_", ".attentions.")
    p = p.replace(".downsamplers_0", ".downsamplers.0").replace(
        ".upsamplers_0", ".upsamplers.0"
    )
    p = p.replace("mid_block.resnets_", "mid_block.resnets.")
    p = p.replace("mid_block.attentions_", "mid_block.attentions.")
    p = p.replace("controlnet_cond_embedding.blocks_", "controlnet_cond_embedding.blocks.")
    p = p.replace(".blocks_0.", ".transformer_blocks.0.")
    p = p.replace(".ff.proj_in", ".ff.net.0.proj").replace(".ff.proj_out", ".ff.net.2")
    p = p.replace(".to_out.", ".to_out.0.")
    p = p.replace("controlnet_down_blocks_", "controlnet_down_blocks.")
    leaf = p.split(".")[-1]
    if leaf == "kernel":
        p = p[: -len("kernel")] + "weight"
    elif leaf == "scale":
        p = p[: -len("scale")] + "weight"
    return p


def _roundtrip_check(flax_tree, port_fn):
    flat = porting.flatten(flax_tree)
    sd = {}
    for path, leaf in flat.items():
        sd[_diffusers_name(path)] = np.zeros(_torch_shape(path, leaf.shape), np.float32)
    mapped = port_fn(sd)  # strict: unmapped torch keys raise
    assert set(mapped) == set(flat), (
        sorted(set(flat) - set(mapped))[:5],
        sorted(set(mapped) - set(flat))[:5],
    )
    for k in flat:
        assert mapped[k].shape == tuple(flat[k].shape), (k, mapped[k].shape, flat[k].shape)


def test_unet_port_bijection():
    unet = SD15UNet()
    x = jnp.zeros((1, 64, 64, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    tree = jax.eval_shape(unet.init, jax.random.key(0), x, t, ctx)["params"]
    _roundtrip_check(tree, port_unet_state_dict)


def test_controlnet_port_bijection():
    cn = SD15UNet(controlnet_mode=True)
    x = jnp.zeros((1, 64, 64, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, 77, 768))
    emb = jnp.zeros((1, 64, 64, 320))
    cond = jnp.zeros((1, 512, 512, 3))
    t1 = jax.eval_shape(
        lambda r: cn.init(r, x, t, ctx, emb, method="controlnet_forward"),
        jax.random.key(0),
    )["params"]
    t2 = jax.eval_shape(
        lambda r: cn.init(r, cond, method="embed_cond"), jax.random.key(0)
    )["params"]
    _roundtrip_check({**t1, **t2}, port_controlnet_state_dict)
