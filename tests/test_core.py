"""Core substrate tests: porting transposes, mesh construction, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edgestyle_tpu.core import porting
from edgestyle_tpu.core.mesh import MeshSpec, batch_sharding, make_mesh, shard_batch


def test_conv_kernel_port_matches_torch(rng):
    x = rng.standard_normal((2, 5, 9, 9), dtype=np.float32)  # NCHW for torch
    conv = torch.nn.Conv2d(5, 7, 3, padding=1)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x)).numpy()

    kernel = porting.conv_kernel(conv.weight.detach().numpy())
    bias = conv.bias.detach().numpy()
    x_nhwc = np.transpose(x, (0, 2, 3, 1))
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x_nhwc),
        jnp.asarray(kernel),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, atol=1e-5)


def test_linear_kernel_port_matches_torch(rng):
    x = rng.standard_normal((3, 11), dtype=np.float32)
    lin = torch.nn.Linear(11, 4)
    with torch.no_grad():
        ref = lin(torch.from_numpy(x)).numpy()
    out = x @ porting.linear_kernel(lin.weight.detach().numpy()) + lin.bias.detach().numpy()
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_key_mapper_strict_raises():
    m = porting.KeyMapper().rule(r"a\.weight", "a.kernel")
    with pytest.raises(KeyError):
        m.apply({"a.weight": np.zeros(1), "b.weight": np.zeros(1)})


def test_unflatten_flatten_roundtrip():
    flat = {"a.b.c": np.ones(2), "a.d": np.zeros(3)}
    tree = porting.unflatten(flat)
    assert set(tree["a"].keys()) == {"b", "d"}
    back = porting.flatten(tree)
    assert set(back) == set(flat)


def test_mesh_and_batch_sharding():
    assert jax.device_count() == 8
    mesh = make_mesh(MeshSpec(data=8, model=1))
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding == batch_sharding(mesh)
    # psum over the data axis must see all 8 shards
    total = jax.jit(lambda b: jnp.sum(b["x"] + 1))(sharded)
    assert total == 16 * 4


def test_persistent_cache_noop_on_cpu():
    """Regression (r3): serializing XLA:CPU executables into the
    persistent compile cache segfaults intermittently, and app mains
    invoked in-process by tests were enabling it for the whole CPU-pinned
    test process. enable_persistent_cache must no-op when jax_platforms
    pins cpu (this test process does, via conftest)."""
    import jax

    from edgestyle_tpu.core.cache import enable_persistent_cache

    before = jax.config.jax_compilation_cache_dir
    enable_persistent_cache("/tmp/should_never_be_set")
    assert jax.config.jax_compilation_cache_dir == before
    assert jax.config.jax_compilation_cache_dir != "/tmp/should_never_be_set"
