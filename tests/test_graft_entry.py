"""Driver-boundary hooks (__graft_entry__).

The bench driver calls dryrun_multichip(8) from a process whose jax backend
initialized with the single real TPU chip (MULTICHIP_r01.json failure mode).
These tests pin the self-provisioning behavior: with enough devices it runs
in-process; with too few it re-execs a virtual-CPU child with the right env.
"""

import sys

import jax
import pytest

import __graft_entry__ as ge


def test_dryrun_runs_in_process_with_enough_devices(monkeypatch):
    # conftest provisions 8 virtual CPU devices, so this must NOT fork.
    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("subprocess must not be used when devices suffice")

    monkeypatch.setattr("subprocess.run", boom)
    calls = []
    monkeypatch.setattr(ge, "_dryrun_impl", lambda n: calls.append(n))
    ge.dryrun_multichip(8)
    assert calls == [8]


def test_dryrun_self_provisions_child_when_short_on_devices(monkeypatch):
    import subprocess

    monkeypatch.setattr(jax, "devices", lambda *a: [object()])  # 1 device

    captured = {}

    def fake_run(argv, cwd=None, env=None, check=None):
        captured.update(argv=argv, cwd=cwd, env=env, check=check)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    ge.dryrun_multichip(8)

    assert captured["argv"][0] == sys.executable
    code = captured["argv"][2]
    assert "jax.config.update('jax_platforms', 'cpu')" in code
    assert "_dryrun_impl(8)" in code
    env = captured["env"]
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_EDGESTYLE_DRYRUN_CHILD"] == "1"
    assert "PYTHONPATH" not in env
    assert captured["check"] is True


def test_dryrun_child_does_not_refork(monkeypatch):
    monkeypatch.setattr(jax, "devices", lambda *a: [object()])
    monkeypatch.setenv("_EDGESTYLE_DRYRUN_CHILD", "1")
    with pytest.raises(RuntimeError, match="did not take effect"):
        ge.dryrun_multichip(8)


def test_dryrun_never_inits_non_cpu_default_backend(monkeypatch):
    """MULTICHIP_r02 regression: on the bench host jax_platforms is
    'axon,cpu' (TPU plugin first). The parent must re-exec the CPU child
    WITHOUT calling jax.devices() at all — enumerating the default backend
    initializes the (possibly wedged) TPU client, and the old
    jax.devices('cpu') in-process branch then left un-placed array creation
    on that client (libtpu-mismatch crash inside the 'cpu' dryrun)."""
    import subprocess

    monkeypatch.setattr(
        type(jax.config), "jax_platforms", property(lambda self: "axon,cpu")
    )

    def no_devices(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("jax.devices() must not be called by the parent")

    monkeypatch.setattr(jax, "devices", no_devices)

    captured = {}

    def fake_run(argv, cwd=None, env=None, check=None):
        captured.update(argv=argv, env=env)

        class R:
            returncode = 0

        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    ge.dryrun_multichip(8)
    code = captured["argv"][2]
    # the child pins cpu BEFORE importing __graft_entry__/running the impl,
    # so the axon client is never created there either
    assert code.index("jax.config.update('jax_platforms', 'cpu')") < code.index(
        "_dryrun_impl(8)"
    )
    assert "--xla_force_host_platform_device_count=8" in captured["env"]["XLA_FLAGS"]
