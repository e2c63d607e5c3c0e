"""Prodigy optimizer as an optax GradientTransformation.

The reference trains with prodigyopt.Prodigy at lr=1.0
(/root/reference/train_text2image_pretrained_openpose.py:923-948, README
recipe lr 1.0) with betas (0.9, 0.999), beta3=None→√β2, decoupled weight
decay 1e-4, eps 1e-8, bias correction on, safeguard warmup on. This is a
faithful port of that algorithm to JAX:

  m ← β1 m + d (1-β1) g
  v ← β2 v + d² (1-β2) g²
  num ← β3 num + (d/d0)·dlr·⟨g, x0 − x⟩
  s ← β3 s + (d/d0)·(d if safeguard else dlr)·g
  d̂ = d_coef · num / Σ|s| ;  d_max ← max(d_max, d̂) ;  d ← min(d_max, d·growth)
  x ← x − dlr·m/(√v + d·ε) − dlr·wd·x      (dlr = d·lr·bias_correction)

The global reductions (⟨g, x0−x⟩ and Σ|s|) run inside the jitted step; under
data-parallel sharding the grads entering here are already the psum-averaged
replicated grads, so the `d` estimate is globally consistent across devices
with no extra collectives (the reference needs no equivalent because DDP
all-reduces grads before the optimizer too).

Exposes `d` in the state for logging — the reference logs it as "train_lr"
(train...py:1282-1284,1304-1310).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class ProdigyState(NamedTuple):
    step: chex.Array
    d: chex.Array
    d_max: chex.Array
    d_numerator: chex.Array
    exp_avg: optax.Updates
    exp_avg_sq: optax.Updates
    s: optax.Updates
    p0: optax.Params


def prodigy(
    learning_rate: float | optax.Schedule = 1.0,
    betas: tuple = (0.9, 0.999),
    beta3: Optional[float] = None,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    decouple: bool = True,
    use_bias_correction: bool = True,
    safeguard_warmup: bool = True,
    d0: float = 1e-6,
    d_coef: float = 1.0,
    growth_rate: float = float("inf"),
) -> optax.GradientTransformation:
    beta1, beta2 = betas
    b3 = beta3 if beta3 is not None else beta2**0.5

    def lr_at(step):
        if callable(learning_rate):
            return learning_rate(step)
        return jnp.asarray(learning_rate, jnp.float32)

    def init_fn(params):
        zeros = lambda: jax.tree.map(jnp.zeros_like, params)
        return ProdigyState(
            step=jnp.zeros([], jnp.int32),
            d=jnp.asarray(d0, jnp.float32),
            d_max=jnp.asarray(d0, jnp.float32),
            d_numerator=jnp.zeros([], jnp.float32),
            exp_avg=zeros(),
            exp_avg_sq=zeros(),
            s=zeros(),
            p0=jax.tree.map(jnp.copy, params),
        )

    def update_fn(grads, state, params):
        if params is None:
            raise ValueError("prodigy requires params in update()")
        k = state.step
        d = state.d
        lr = lr_at(k)

        if use_bias_correction:
            bc = jnp.sqrt(1.0 - beta2 ** (k.astype(jnp.float32) + 1.0)) / (
                1.0 - beta1 ** (k.astype(jnp.float32) + 1.0)
            )
        else:
            bc = jnp.float32(1.0)
        dlr = d * lr * bc

        # first-moment / second-moment with d-scaled grads
        exp_avg = jax.tree.map(
            lambda m, g: beta1 * m + d * (1 - beta1) * g, state.exp_avg, grads
        )
        exp_avg_sq = jax.tree.map(
            lambda v, g: beta2 * v + d * d * (1 - beta2) * g * g,
            state.exp_avg_sq,
            grads,
        )

        # distance-estimate accumulators
        dot = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(
                lambda g, p, p_init: jnp.sum(
                    g.astype(jnp.float32) * (p_init - p).astype(jnp.float32)
                ),
                grads, params, state.p0,
            ),
            jnp.float32(0.0),
        )
        d_numerator = b3 * state.d_numerator + (d / d0) * dlr * dot

        s_coef = (d / d0) * (d if safeguard_warmup else dlr)
        s = jax.tree.map(lambda s_, g: b3 * s_ + s_coef * g, state.s, grads)
        d_denom = jax.tree.reduce(
            lambda a, b: a + b,
            jax.tree.map(lambda x: jnp.sum(jnp.abs(x.astype(jnp.float32))), s),
            jnp.float32(0.0),
        )

        d_hat = jnp.where(
            d_denom > 0.0, d_coef * d_numerator / jnp.maximum(d_denom, 1e-30), d
        )
        d_max = jnp.maximum(state.d_max, d_hat)
        new_d = jnp.minimum(d_max, d * growth_rate)
        new_d = jnp.maximum(new_d, d)  # monotone (growth_rate caps increase)

        def upd(m, v, p):
            # prodigyopt applies the param update AFTER updating d, so the
            # eps term uses the NEW d while dlr keeps the old one
            step_term = dlr * m / (jnp.sqrt(v) + new_d * eps)
            if weight_decay > 0.0 and decouple:
                step_term = step_term + dlr * weight_decay * p
            return -step_term

        updates = jax.tree.map(upd, exp_avg, exp_avg_sq, params)
        new_state = ProdigyState(
            step=k + 1,
            d=new_d,
            d_max=d_max,
            d_numerator=d_numerator,
            exp_avg=exp_avg,
            exp_avg_sq=exp_avg_sq,
            s=s,
            p0=state.p0,
        )
        return updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def get_d(opt_state) -> jax.Array:
    """Extract the Prodigy `d` (the logged 'train_lr') from a possibly
    chained/wrapped optax state."""
    found = []

    def visit(s):
        if isinstance(s, ProdigyState):
            found.append(s.d)
        elif isinstance(s, tuple):
            for x in s:
                visit(x)

    visit(opt_state)
    if not found:
        raise ValueError("no ProdigyState found")
    return found[0]
