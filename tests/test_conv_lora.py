"""Conv-LoRA (reference --controllora_conv2d_rank,
model/controllora.py:561-575): adapter targeting, the merged-kernel
algebra vs torch's LoRAConv2dLayer composition (kxk down conv -> 1x1 up
conv), and gradient flow through the in-jit merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgestyle_tpu.models.unet import (
    SD15UNet,
    UNetConfig,
    init_lora_params,
    is_lora_conv_path,
    merge_lora,
    split_trunk_params,
)

TINY = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                  cross_attention_dim=8, num_heads=2)


def _tiny_trunk():
    unet = SD15UNet(TINY, attn_impl="xla")
    p = unet.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)),
                  jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 8)))["params"]
    return split_trunk_params(p)


def test_conv_rank_gates_and_linear_rank_applies():
    trunk = _tiny_trunk()
    no_conv = init_lora_params(jax.random.key(1), trunk, rank=4)
    with_conv = init_lora_params(jax.random.key(1), trunk, rank=4, conv_rank=2)

    def flat(t, pre=()):
        for k, v in t.items():
            if isinstance(v, dict) and set(v) == {"down", "up"}:
                yield pre + (k,), v
            elif isinstance(v, dict):
                yield from flat(v, pre + (k,))

    base = dict(flat(no_conv))
    full = dict(flat(with_conv))
    conv_adapters = {p: v for p, v in full.items() if v["down"].ndim == 4}
    assert conv_adapters and not any(v["down"].ndim == 4 for v in base.values())
    # linear adapters unchanged by the conv gate
    assert set(base) <= set(full)
    # the reference quirk: conv adapters run at the LINEAR rank
    for v in conv_adapters.values():
        assert v["down"].shape[-1] == 4 and v["up"].shape[0] == 4
    # conv_in is a target (it's in the tied trunk / _skip_layers)
    assert any(p[0] == "conv_in" for p in conv_adapters)
    assert all(is_lora_conv_path(p) for p in conv_adapters)


def test_merged_conv_kernel_matches_torch_lora_composition():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    kh = kw = 3
    cin, cout, r = 5, 7, 4
    base = rng.standard_normal((kh, kw, cin, cout)).astype(np.float32) * 0.1
    down = rng.standard_normal((kh, kw, cin, r)).astype(np.float32) * 0.1
    up = rng.standard_normal((r, cout)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, cin, 9, 9)).astype(np.float32)

    # torch LoRAConv2dLayer semantics: y = conv(x, W) + up1x1(down_kxk(x))
    Wt = torch.from_numpy(np.transpose(base, (3, 2, 0, 1)))
    Dt = torch.from_numpy(np.transpose(down, (3, 2, 0, 1)))
    Ut = torch.from_numpy(np.transpose(up, (1, 0))[:, :, None, None])
    xt = torch.from_numpy(x)
    want = F.conv2d(xt, Wt, padding=1) + F.conv2d(
        F.conv2d(xt, Dt, padding=1), Ut
    )

    merged = merge_lora({"conv": {"kernel": jnp.asarray(base)}},
                        {"conv": {"kernel": {"down": jnp.asarray(down),
                                             "up": jnp.asarray(up)}}})
    got = jax.lax.conv_general_dilated(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), merged["conv"]["kernel"],
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want.numpy(), atol=1e-5
    )


def test_gradients_flow_into_conv_adapters():
    trunk = _tiny_trunk()
    lora = init_lora_params(jax.random.key(1), trunk, rank=2, conv_rank=2)

    def loss(lp):
        merged = merge_lora(trunk, lp)
        s = 0.0
        for k in ("conv_in",):
            s = s + jnp.sum(merged[k]["kernel"] ** 2)
        return s

    g = jax.jit(jax.grad(loss))(lora)
    gd = np.asarray(g["conv_in"]["kernel"]["down"])
    gu = np.asarray(g["conv_in"]["kernel"]["up"])
    # up starts at zero -> d/d_down = 0 but d/d_up != 0 (base @ down != 0)
    assert np.abs(gu).max() > 0
    assert gd.shape == np.asarray(lora["conv_in"]["kernel"]["down"]).shape


def test_train_cli_accepts_reference_recipe():
    """The README training command's flag set (README.md:66-97) parses
    unchanged (module names swapped for local paths)."""
    from edgestyle_tpu.apps.train import parse_args

    args = parse_args([
        "--output_dir", "/tmp/out", "--resolution=512",
        "--train_batch_size=2", "--gradient_accumulation_steps", "32",
        "--mixed_precision", "fp16", "--controllora_use_vae", "--seed=42",
        "--resume_from_checkpoint", "latest", "--num_validation_images", "4",
        "--checkpoints_total_limit", "3", "--dataloader_num_workers", "2",
        "--snr_gamma=5.0", "--optimizer=prodigy", "--learning_rate=1.0",
        "--prodigy_safeguard_warmup=True", "--prodigy_use_bias_correction=True",
        "--adam_beta1=0.9", "--adam_beta2=0.99", "--adam_weight_decay=0.01",
        "--proportion_empty_prompts=0.1", "--proportion_empty_images=0.1",
        "--proportion_cutout_images=0.1", "--proportion_patchworked_images=0.1",
        "--proportion_patchworks=0.1", "--validation_steps", "100",
        "--checkpointing_steps", "100", "--max_train_steps=20000",
        "--random_init",
    ])
    assert args.adam_beta2 == 0.99 and args.prodigy_safeguard_warmup is True
    assert args.mixed_precision == "fp16" and args.max_train_steps == 20000
