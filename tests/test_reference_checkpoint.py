"""Reference-layout trained-checkpoint loading: the reference trainer's
final save (diffusion_pytorch_model.safetensors fusion + controlnet_0/1
ControlLoRA subsets, train...py:1373-1382) must load into this framework's
trainable trees and run.

The saved ControlLoRA subset is non-tied modules + '.lora_layer.' weights
(controllora.py:600-606); the fusion file holds only the 13 fusion blocks
(edgestyle_multicontrolnet.py:173-193)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from safetensors.numpy import save_file

from edgestyle_tpu.core.pretrained import (
    load_edgestyle_pretrained_dir,
    port_controllora_state_dict,
    port_fusion_state_dict,
)
from edgestyle_tpu.models.multicontrolnet import ControlNetFusionBlock
from edgestyle_tpu.models.unet import (
    SD15UNet,
    init_lora_params,
    split_trunk_params,
)
from tests import torch_sd15 as T
from tests.test_layers import to_nchw, to_nhwc
from tests.test_multicontrolnet import TorchControlNetBlock, port_fusion_block
from tests.test_unet import TINY

_SKIP_TOPS = {"conv_in", "time_proj", "time_embedding", "class_embedding",
              "down_blocks", "mid_block"}
TCFG = dict(in_channels=4, block_out_channels=(32, 64), layers_per_block=1,
            cross_attention_dim=24, num_heads=2)


def _controllora_saved_subset(tmod, rank=4, seed=0):
    """Reproduce ControlLoRAModel.state_dict(): non-tied keys + synthetic
    lora_layer weights for every Linear under the tied trunk."""
    g = torch.Generator().manual_seed(seed)
    sd = {k: v for k, v in tmod.state_dict().items()
          if k.split(".")[0] not in _SKIP_TOPS}
    # the saved dict carries the tied conv_in via the VAE cond embedding
    # (conv_vae_out, reference controllora.py:36) — loader must drop it
    sd["controlnet_cond_embedding.conv_vae_out.weight"] = tmod.conv_in.weight.detach()
    sd["controlnet_cond_embedding.conv_vae_out.bias"] = tmod.conv_in.bias.detach()
    for name, mod in tmod.named_modules():
        if name.split(".")[0] in _SKIP_TOPS and isinstance(mod, torch.nn.Linear):
            din, dout = mod.in_features, mod.out_features
            sd[f"{name}.lora_layer.down.weight"] = torch.randn(
                (rank, din), generator=g) / rank
            sd[f"{name}.lora_layer.up.weight"] = torch.randn(
                (dout, rank), generator=g) * 0.01
    return {k: np.asarray(v.detach(), np.float32) for k, v in sd.items()}


def _write_reference_dir(tmp_path, tmod0, tmod1, fusion_blocks):
    fusion_sd = {}
    for key, blk in fusion_blocks.items():
        for k, v in blk.state_dict().items():
            fusion_sd[f"{key}.{k}"] = np.asarray(v.detach(), np.float32)
    save_file(fusion_sd, str(tmp_path / "diffusion_pytorch_model.safetensors"))
    for i, tmod in enumerate((tmod0, tmod1)):
        d = tmp_path / f"controlnet_{i}"
        os.makedirs(d, exist_ok=True)
        save_file(_controllora_saved_subset(tmod, seed=i),
                  str(d / "diffusion_pytorch_model.safetensors"))


@pytest.fixture(scope="module")
def reference_dir(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("ref_ckpt")
    torch.manual_seed(0)
    tmod0 = T.ControlNetModel(TCFG).eval()
    tmod1 = T.ControlNetModel(TCFG).eval()
    # two fusion positions are enough to exercise the mapper (the loader
    # is shape-agnostic; the reference always ships all 13)
    fusion_blocks = {
        "multi_controlnet_down_blocks.0": TorchControlNetBlock(32, (16, 16), 6),
        "multi_controlnet_mid_block": TorchControlNetBlock(64, (8, 8), 6),
    }
    _write_reference_dir(tmp_path, tmod0, tmod1, fusion_blocks)
    return tmp_path, tmod0, tmod1, fusion_blocks


def test_lora_paths_match_our_adapter_tree(reference_dir):
    """The loaded lora tree must target exactly the kernels our own
    init_lora_params targets — the blanket-linear injection sets agree."""
    path, tmod0, _, _ = reference_dir
    tr = load_edgestyle_pretrained_dir(str(path))

    unet = SD15UNet(TINY, attn_impl="xla")
    up = unet.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4)),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 24)))["params"]
    ours = init_lora_params(jax.random.key(1), split_trunk_params(up), 4)

    def paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict) and set(v) == {"down", "up"}:
                out.add(prefix + (k,))
            elif isinstance(v, dict):
                out |= paths(v, prefix + (k,))
        return out

    assert paths(tr["lora_0"]) == paths(ours)


def test_lora_values_transposed(reference_dir):
    path, tmod0, _, _ = reference_dir
    sd = _controllora_saved_subset(tmod0, seed=0)
    lora, heads = port_controllora_state_dict(sd)
    # first attention q projection of the first down block
    got = lora["down_blocks_0"]["attentions_0"]["blocks_0"]["attn1"]["to_q"]["kernel"]
    ref_down = sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_layer.down.weight"]
    ref_up = sd["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_layer.up.weight"]
    np.testing.assert_array_equal(got["down"], ref_down.T)
    np.testing.assert_array_equal(got["up"], ref_up.T)
    # zero-conv heads came through in HWIO
    k0 = heads["controlnet_down_blocks_0"]["kernel"]
    assert k0.shape == (1, 1, 32, 32)


def test_fusion_blocks_numerically_correct(reference_dir):
    """Loaded fusion params reproduce the torch block's forward."""
    path, _, _, fusion_blocks = reference_dir
    tr = load_edgestyle_pretrained_dir(str(path))
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 32 * 6, 16, 16), dtype=np.float32)
    tblk = fusion_blocks["multi_controlnet_down_blocks.0"].eval()
    with torch.no_grad():
        ref = tblk(torch.from_numpy(x)).numpy()
    mod = ControlNetFusionBlock(channels=32, num_nets=6)
    out = mod.apply(
        {"params": tr["fusion"]["multi_controlnet_down_blocks_0"]},
        jnp.asarray(to_nhwc(x)),
    )
    np.testing.assert_allclose(to_nchw(out), ref, atol=1e-5)


def test_fusion_port_matches_existing_block_port(reference_dir):
    """Directory loader ≡ the per-block port helper used by the torch
    parity tests (same transposes)."""
    _, _, _, fusion_blocks = reference_dir
    tblk = fusion_blocks["multi_controlnet_mid_block"]
    via_dir = port_fusion_state_dict({
        f"multi_controlnet_mid_block.{k}": np.asarray(v.detach(), np.float32)
        for k, v in tblk.state_dict().items()
    })["multi_controlnet_mid_block"]
    via_block = port_fusion_block(tblk)
    flat_a = jax.tree.leaves(via_dir)
    flat_b = jax.tree.leaves(via_block)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("conv_rank", [0, 4])
def test_reference_layout_round_trip(conv_rank):
    """export_reference_layout → load_edgestyle_pretrained_dir is the
    identity on the trainable set (bidirectional interop: training done
    here is consumable by the reference stack and vice versa) — with and
    without conv-LoRA adapters (--controllora_conv2d_rank>0 saves
    LoRAConv2dLayer down/up conv weights, controllora.py:561-575)."""
    import tempfile

    from edgestyle_tpu.core.pretrained import export_reference_layout
    from edgestyle_tpu.models.multicontrolnet import EdgeStyleMultiControlNet

    unet = SD15UNet(TINY, attn_impl="xla")
    up = unet.init(jax.random.key(0), jnp.zeros((1, 16, 16, 4)),
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 24)))["params"]
    trunk = split_trunk_params(up)
    rng = np.random.default_rng(0)

    def heads_like():
        mcn = EdgeStyleMultiControlNet(TINY, attn_impl="xla")
        cp = mcn.branch.init(jax.random.key(2), jnp.zeros((1, 16, 16, 4)),
                             jnp.zeros((1,), jnp.int32), jnp.zeros((1, 7, 24)),
                             jnp.zeros((1, 16, 16, 32)),
                             method="controlnet_forward")["params"]
        return {k: jax.tree.map(lambda a: np.asarray(
                    rng.standard_normal(a.shape), np.float32), v)
                for k, v in cp.items() if k.startswith("controlnet_")}

    mcn = EdgeStyleMultiControlNet(TINY, attn_impl="xla")
    trainable = {
        "lora_0": init_lora_params(jax.random.key(3), trunk, 4, conv_rank),
        "lora_1": init_lora_params(jax.random.key(4), trunk, 4, conv_rank),
        "heads_0": heads_like(),
        "heads_1": heads_like(),
        "fusion": mcn.init_fusion(jax.random.key(5), sample_hw=(16, 16)),
    }
    with tempfile.TemporaryDirectory() as d:
        export_reference_layout(d, trainable, unet_conv_in=up["conv_in"])
        back = load_edgestyle_pretrained_dir(d)
    la = jax.tree.leaves_with_path(trainable)
    lb = jax.tree.leaves_with_path(back)
    assert len(la) == len(lb)
    bmap = {jax.tree_util.keystr(p): v for p, v in lb}
    for p, v in la:
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), bmap[jax.tree_util.keystr(p)],
            err_msg=jax.tree_util.keystr(p))
