"""Validation-by-generation grid + profiling utilities (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline
from edgestyle_tpu.training.train_step import init_trainable
from edgestyle_tpu.training.validation import assemble_inference_params, log_validation
from edgestyle_tpu.utils.profiling import compiled_flops, timeit
from tests.test_pipeline import TINY_PIPE


def test_log_validation_grid(rng):
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    params = pipe.init_params(jax.random.key(0))
    frozen = {
        "vae": params["vae"], "clip": params["clip"], "unet": params["unet"],
        "static": params["controlnet"]["static"],
    }
    trainable = init_trainable(pipe, jax.random.key(1), params["unet"], lora_rank=4)
    b, hw = 2, 32
    img = lambda: rng.standard_normal((b, hw, hw, 3)).astype(np.float32) * 0.2
    batch = {
        "original": img(), "agnostic": img(), "head": img(), "clothes": img(),
        "clothes2": img(),
        "original_openpose": np.abs(img()), "clothes_openpose": np.abs(img()),
        "clothes_openpose2": np.abs(img()),
        "input_ids": rng.integers(1, 99, (b, 7)).astype(np.int32),
    }

    class W:
        logged = None
        def add_image(self, tag, grid, step, dataformats):
            W.logged = (tag, grid.shape, step, dataformats)

    grid = log_validation(
        pipe, frozen, trainable, batch, step=7, writer=W(),
        guidance_scales=(1.0, 3.0), num_inference_steps=2,
    )
    # 3 context rows + 2 guidance rows, each row = b images side by side
    assert grid.shape == (5 * hw, b * hw, 3)
    assert W.logged[0] == "validation" and W.logged[2] == 7
    assert np.isfinite(grid).all()


def test_assemble_inference_params_ties_trunk():
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    params = pipe.init_params(jax.random.key(0))
    frozen = {
        "vae": params["vae"], "clip": params["clip"], "unet": params["unet"],
        "static": params["controlnet"]["static"],
    }
    trainable = init_trainable(pipe, jax.random.key(1), params["unet"], lora_rank=4)
    asm = assemble_inference_params(frozen, trainable)
    assert asm["controlnet"]["lora_0"]["conv_in"]["kernel"] is frozen["unet"]["conv_in"]["kernel"]


def test_compiled_flops_and_timeit():
    f = lambda x: x @ x
    x = jnp.ones((128, 128))
    cost = compiled_flops(f, x)
    assert cost["flops"] >= 2 * 128**3 * 0.9
    t = timeit(jax.jit(f), x, iters=2)
    assert t > 0
