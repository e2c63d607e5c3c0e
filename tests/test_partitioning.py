"""Tensor-parallel sharding: TP-sharded UNet forward on a (data=2, model=4)
mesh matches the unsharded result, and the kernels are actually sharded."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from edgestyle_tpu.core.mesh import MeshSpec, make_mesh
from edgestyle_tpu.core.partitioning import shard_params_tp, tp_spec_for_path
from edgestyle_tpu.core.porting import flatten
from edgestyle_tpu.models.unet import SD15UNet
from tests.test_unet import TINY


def test_tp_spec_rules():
    assert tp_spec_for_path("a.attn1.to_q.kernel", 2) == P(None, "model")
    assert tp_spec_for_path("a.attn1.to_out.kernel", 2) == P("model", None)
    assert tp_spec_for_path("a.ff.proj_in.kernel", 2) == P(None, "model")
    assert tp_spec_for_path("a.conv1.kernel", 4) == P()
    assert tp_spec_for_path("a.norm1.scale", 1) == P()


def test_tp_forward_matches_unsharded(rng):
    mesh = make_mesh(MeshSpec(data=2, model=4))
    unet = SD15UNet(TINY, attn_impl="xla")
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    t = jnp.array([5, 9], jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, 24)), jnp.float32)
    params = unet.init(jax.random.key(0), x, t, ctx)

    ref = jax.jit(unet.apply)(params, x, t, ctx)

    sharded = {"params": shard_params_tp(mesh, params["params"])}
    # verify at least one kernel is sharded over model
    flat = flatten(sharded["params"])
    qk = next(v for k, v in flat.items() if k.endswith("attn1.to_q.kernel"))
    assert qk.sharding.spec == P(None, "model")

    xb = jax.device_put(x, NamedSharding(mesh, P("data")))
    out = jax.jit(unet.apply)(sharded, xb, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.heavy
def test_dp_tp_train_step_matches_single_device():
    """VERDICT r1 item 10: the full ControlLoRA train step on a 2-D
    (data=4, model=2) mesh — TP-sharded frozen kernels + batch sharded on
    data + replicated trainables — must (a) reproduce the single-device
    update and (b) compile to collectives over BOTH mesh axes."""
    import re

    from edgestyle_tpu.core.mesh import DATA_AXIS
    from edgestyle_tpu.core.partitioning import shard_pipeline_frozen_tp
    from edgestyle_tpu.pipelines.tryon import EdgeStylePipeline
    from edgestyle_tpu.training.train_step import (
        TrainConfig,
        init_trainable,
        make_optimizer,
        make_train_step,
    )
    from tests.test_training import TINY_PIPE, _batch

    pipe = EdgeStylePipeline(TINY_PIPE, attn_impl="xla")
    params = pipe.init_params(jax.random.key(0))
    frozen = {
        "vae": params["vae"],
        "clip": params["clip"],
        "unet": params["unet"],
        "static": params["controlnet"]["static"],
    }
    cfg = TrainConfig(grad_accum=1, lr_total_steps=None)
    trainable = init_trainable(pipe, jax.random.key(1), params["unet"], lora_rank=4)
    state = {
        "trainable": trainable,
        "opt_state": make_optimizer(cfg).init(trainable),
        "step": jnp.zeros([], jnp.int32),
    }
    step = make_train_step(pipe, cfg)
    batch = _batch(3, accum=1, mb=4)

    # single device reference
    s1, m1 = jax.jit(step)(state, frozen, batch, jax.random.key(9))

    mesh = make_mesh(MeshSpec(data=4, model=2))
    repl = NamedSharding(mesh, P())
    frozen_tp = shard_pipeline_frozen_tp(mesh, frozen)
    qk = flatten(frozen_tp["unet"])
    k_sh = next(v for k, v in qk.items() if k.endswith("attn1.to_q.kernel"))
    assert k_sh.sharding.spec == P(None, "model")

    batch_s = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(None, DATA_AXIS))), batch
    )
    state_r = jax.tree.map(lambda x: jax.device_put(x, repl), state)

    lowered = jax.jit(step).lower(state_r, frozen_tp, batch_s, jax.random.key(9))
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo
    # model-axis collectives group adjacent devices — literal {{0,1},{2,3},…}
    # or iota form [4,2]<=[8]; data-axis collectives stride across the model
    # dim — iota form [2,4]<=[4,2]T(1,0) or literal {0,2,4,6}
    model_groups = ("{{0,1},{2,3}" in hlo) or ("[4,2]<=[8]" in hlo)
    data_groups = ("T(1,0)" in hlo) or ("{0,2,4,6}" in hlo)
    assert model_groups, re.findall(r"replica_groups=[^ ]+", hlo)[:5]
    assert data_groups, re.findall(r"replica_groups=[^ ]+", hlo)[:5]

    s2, m2 = jax.jit(step)(state_r, frozen_tp, batch_s, jax.random.key(9))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-4)
    for a, b in zip(jax.tree.leaves(s1["trainable"]), jax.tree.leaves(s2["trainable"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)
