"""Quality metrics for parity benchmarking.

BASELINE.md's acceptance bar is SSIM ≥ 0.98 vs reference fp32 outputs
(bitwise-close at fp32, perceptual parity at bf16). SSIM/PSNR/MAE here are
pure JAX so parity sweeps run on-device; CLIP score reuses the CLIP towers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_window(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return g[:, None] * g[None, :]


def ssim(a: jax.Array, b: jax.Array, max_val: float = 1.0,
         window_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over (B,H,W,C) images (per-channel windows, standard
    Wang et al. constants — matches skimage/torchmetrics defaults)."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    w = _gaussian_window(window_size, sigma)
    ch = a.shape[-1]
    kern = jnp.broadcast_to(w[:, :, None, None], (window_size, window_size, 1, ch))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=ch,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))


def psnr(a: jax.Array, b: jax.Array, max_val: float = 1.0) -> jax.Array:
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)),
                   axis=tuple(range(1, a.ndim)))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def mae(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)),
                    axis=tuple(range(1, a.ndim)))


def clip_score(encode_image_fn, images01: jax.Array, text_embeds: jax.Array) -> jax.Array:
    """Cosine similarity between image embeddings and given text embeds."""
    img = encode_image_fn(images01)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return jnp.sum(img * txt, axis=-1)
