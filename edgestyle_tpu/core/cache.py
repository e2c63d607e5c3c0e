"""Persistent XLA compilation cache. First compile of the full train step
is tens of minutes through the tunneled backend; the on-disk cache makes
every subsequent process start near-instant. Called by all entry points."""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/jax_comp_cache")


def enable_persistent_cache(path: str = _DEFAULT) -> None:
    import jax

    # Never enable on a CPU-pinned process: serializing XLA:CPU
    # executables into the cache segfaults intermittently (reproduced
    # twice in the r3 test suite: put_executable_and_time → SIGSEGV; the
    # multichip dryrun child disables the cache for the same reason), and
    # CPU compiles are fast enough that the cache buys nothing there. The
    # cache exists for the tunneled TPU backend. jax.config.jax_platforms
    # is how this tree pins CPU (the axon plugin ignores JAX_PLATFORMS
    # env), so checking it avoids initializing any backend here. Only the
    # PRIMARY platform matters: the axon image defaults to "axon,cpu",
    # where cpu is just the fallback.
    plats = getattr(jax.config, "jax_platforms", None)
    if plats and str(plats).split(",")[0].strip() == "cpu":
        return
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
