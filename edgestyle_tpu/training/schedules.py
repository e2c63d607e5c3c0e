"""LR schedules with diffusers `get_scheduler` semantics.

The reference training script builds its scheduler via
diffusers.optimization.get_scheduler(args.lr_scheduler, ...,
num_cycles=args.lr_num_cycles, power=args.lr_power)
(/root/reference/train_text2image_pretrained_openpose.py:948-954, flags
:409-416). This module transcribes those lambda formulas as pure
step→lr functions usable as optax schedules (everything here is traced
into the jitted train step — no host control flow).

Names: constant, constant_with_warmup, linear, cosine,
cosine_with_restarts, polynomial. ``cosine_annealing`` is kept as an
alias of ``cosine`` for this repo's earlier CLI.
"""

from __future__ import annotations

import jax.numpy as jnp

NAMES = ("constant", "constant_with_warmup", "linear", "cosine",
         "cosine_with_restarts", "polynomial", "cosine_annealing")


def build_lr_schedule(name: str, learning_rate: float, warmup_steps: int = 0,
                      total_steps: int | None = None, num_cycles: float = 1.0,
                      power: float = 1.0, lr_end: float = 1e-7):
    """step (int array) → lr (f32 array). Formulas match diffusers:
    warmup is linear 0→lr over ``warmup_steps`` for every schedule except
    plain ``constant``; cosine runs the half-wave (its library-default
    num_cycles=0.5 — get_scheduler only forwards num_cycles to
    cosine_with_restarts and power to polynomial)."""
    if name == "cosine_annealing":
        name = "cosine"
    if name not in NAMES:
        raise ValueError(f"unknown lr_scheduler {name!r}; known: {NAMES}")
    if name not in ("constant", "constant_with_warmup") and not total_steps:
        raise ValueError(f"lr_scheduler={name!r} needs total_steps")
    lr = float(learning_rate)
    w = max(int(warmup_steps), 0)

    def sched(step):
        s = jnp.asarray(step, jnp.float32)
        warm = s / max(w, 1)
        if name == "constant":
            mult = jnp.asarray(1.0, jnp.float32)
        elif name == "constant_with_warmup":
            mult = jnp.minimum(1.0, warm) if w else jnp.asarray(1.0, jnp.float32)
        else:
            t = max(int(total_steps) - w, 1)
            progress = (s - w) / t
            if name == "linear":
                mult = jnp.maximum(0.0, 1.0 - progress)
            elif name == "cosine":
                mult = jnp.maximum(
                    0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * 0.5 * progress))
                )
            elif name == "cosine_with_restarts":
                frac = jnp.mod(float(num_cycles) * progress, 1.0)
                mult = jnp.where(
                    progress >= 1.0, 0.0,
                    jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * frac))),
                )
            else:  # polynomial — decays lr→lr_end, returned as a multiplier
                pct = jnp.clip(1.0 - progress, 0.0, 1.0)
                decay = (lr - lr_end) * pct ** float(power) + lr_end
                mult = jnp.where(s > float(total_steps),
                                 jnp.asarray(lr_end / lr, jnp.float32),
                                 decay / lr)
            if w:
                mult = jnp.where(s < w, warm, mult)
        return (lr * mult).astype(jnp.float32)

    return sched
