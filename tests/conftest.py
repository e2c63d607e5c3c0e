"""Test environment: force an 8-device virtual CPU platform so multi-chip
sharding tests run without TPU hardware (SURVEY.md §4 implication: the
reference has no test suite; this pyramid is new). Must run before jax
imports anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax  # noqa: E402

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var; the
# config update is honoured.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Full-suite runs (only — every crashing test passes in isolation and its
# file passes alone) hit a deterministic SIGSEGV inside XLA:CPU's
# backend_compile when the suite's most complex program (the
# caches+cfg-window combo scan in test_pipeline) compiles in a process
# that has already compiled hundreds of executables. Root cause is inside
# XLA:CPU (not the persistent cache — disabled on CPU since 63bf51a — and
# not LLVM codegen threading — --xla_cpu_parallel_codegen_split_count=1
# did not help). Dropping the accumulated executables before the heavy
# modules compile their big programs removes the trigger and caps suite
# RSS; the cost is re-jitting a few shared tiny programs per listed
# module.
_CLEAR_CACHES_BEFORE = {
    "test_pipeline", "test_training", "test_preprocess", "test_tryon_e2e",
    "test_quant", "test_tome", "test_fused_tryon",
}


@pytest.fixture(autouse=True, scope="module")
def _fresh_jax_caches_for_heavy_modules(request):
    if request.module.__name__.rpartition(".")[2] in _CLEAR_CACHES_BEFORE:
        jax.clear_caches()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
