"""Min-SNR-γ loss weighting (arXiv:2303.09556), as used by the reference
trainer (/root/reference/train_text2image_pretrained_openpose.py:1253-1280,
recipe snr_gamma=5.0): weights = min(SNR(t), γ)/SNR(t), with SNR+1 in the
divisor-SNR for v-prediction."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from edgestyle_tpu.schedulers.ddpm import NoiseSchedule, compute_snr


def min_snr_weights(
    sched: NoiseSchedule, timesteps: jax.Array, gamma: float
) -> jax.Array:
    snr = compute_snr(sched, timesteps)
    if sched.prediction_type == "v_prediction":
        snr = snr + 1.0
    return jnp.minimum(snr, gamma) / snr


def weighted_mse(pred, target, weights):
    """Per-sample-mean MSE × weights → scalar (reference :1270-1280)."""
    per = jnp.mean(
        jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)),
        axis=tuple(range(1, pred.ndim)),
    )
    return jnp.mean(per * weights)
