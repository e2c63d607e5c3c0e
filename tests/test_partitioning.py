"""Tensor-parallel sharding: TP-sharded UNet forward on a (data=2, model=4)
mesh matches the unsharded result, and the kernels are actually sharded."""

import jax
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
