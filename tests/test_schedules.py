"""LR schedules vs the diffusers get_scheduler formulas the reference
training script uses (train_text2image_pretrained_openpose.py:948-954),
pinned against an independent numpy transcription of each lambda."""

import math

import numpy as np
import pytest

from edgestyle_tpu.training.schedules import build_lr_schedule


def _diffusers_mult(name, step, warmup, total, num_cycles=1.0, power=1.0,
                    lr=2.0, lr_end=1e-7):
    """Direct transcription of diffusers.optimization lambdas."""
    if name == "constant":
        return 1.0
    if step < warmup and warmup:
        return step / max(1, warmup)
    if name == "constant_with_warmup":
        return 1.0
    progress = (step - warmup) / max(1, total - warmup)
    if name == "linear":
        return max(0.0, (total - step) / max(1, total - warmup))
    if name == "cosine":
        return max(0.0, 0.5 * (1.0 + math.cos(math.pi * 0.5 * 2.0 * progress)))
    if name == "cosine_with_restarts":
        if progress >= 1.0:
            return 0.0
        return max(0.0, 0.5 * (1.0 + math.cos(math.pi * ((num_cycles * progress) % 1.0))))
    if name == "polynomial":
        if step > total:
            return lr_end / lr
        pct = 1.0 - (step - warmup) / (total - warmup)
        return ((lr - lr_end) * pct**power + lr_end) / lr
    raise AssertionError(name)


@pytest.mark.parametrize("name,kw", [
    ("constant", {}),
    ("constant_with_warmup", {}),
    ("linear", {}),
    ("cosine", {}),
    ("cosine_annealing", {}),  # alias of cosine
    ("cosine_with_restarts", {"num_cycles": 3.0}),
    ("polynomial", {"power": 2.0}),
])
def test_schedule_matches_diffusers_formula(name, kw):
    warmup, total, lr = 10, 100, 2.0
    sched = build_lr_schedule(name, lr, warmup, total, **kw)
    ref_name = "cosine" if name == "cosine_annealing" else name
    for step in [0, 1, 5, 9, 10, 11, 37, 50, 99, 100, 120]:
        want = lr * _diffusers_mult(ref_name, step, warmup, total, **kw)
        got = float(sched(step))
        assert abs(got - want) < 1e-5 * max(1.0, abs(want)), (name, step, got, want)


def test_linear_hits_zero_and_cosine_half_period():
    s = build_lr_schedule("linear", 1.0, 0, 50)
    assert float(s(50)) == pytest.approx(0.0, abs=1e-7)
    c = build_lr_schedule("cosine", 1.0, 0, 50)
    assert float(c(25)) == pytest.approx(0.5, abs=1e-6)
    assert float(c(0)) == pytest.approx(1.0, abs=1e-6)


def test_restarts_actually_restart():
    s = build_lr_schedule("cosine_with_restarts", 1.0, 0, 90, num_cycles=3.0)
    # each 30-step cycle begins back at full lr
    assert float(s(0)) == pytest.approx(1.0, abs=1e-6)
    assert float(s(30)) == pytest.approx(1.0, abs=1e-6)
    assert float(s(60)) == pytest.approx(1.0, abs=1e-6)
    assert float(s(29)) < 0.01


def test_unknown_and_missing_total_raise():
    with pytest.raises(ValueError):
        build_lr_schedule("exotic", 1.0, 0, 10)
    with pytest.raises(ValueError):
        build_lr_schedule("cosine", 1.0, 0, None)


def test_schedule_is_jit_traceable():
    import jax
    import jax.numpy as jnp

    sched = build_lr_schedule("cosine_with_restarts", 1.0, 5, 100, num_cycles=2)
    vals = jax.jit(jax.vmap(sched))(jnp.arange(100))
    assert np.isfinite(np.asarray(vals)).all()
