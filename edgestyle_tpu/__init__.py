"""EdgeStyle-TPU: a TPU-native virtual try-on framework (JAX / XLA / Pallas).

A from-scratch rebuild of the capabilities of andrei-ace/EdgeStyle
(SD1.5 + 6-branch MultiControlNet virtual clothing try-on) designed for
TPU hardware: NHWC layouts, bf16 MXU matmuls, fixed-shape `lax.scan`
denoise loops, `jax.sharding` data parallelism over ICI, and Pallas
kernels for the hot attention ops.

Layering (bottom → top):
  core/        dtype policy, mesh/sharding, param utilities, weight porting
  ops/         Pallas + XLA compute kernels (attention, LiteMLA, norms, morphology)
  models/      VAE, CLIP text, UNet, ControlNet family, EfficientViT-SAM, OpenPose
  schedulers/  DDPM (train), DDIM / UniPC (sampling) as fixed-shape scan steps
  pipelines/   end-to-end jitted try-on program
  training/    Prodigy optimizer, Min-SNR loss, train step, checkpointing
  data/        host-side transforms / augmentations / collate / prompt mining
  apps/        CLI entry points
"""

__version__ = "0.1.0"
