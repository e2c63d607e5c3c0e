"""Persistent XLA compilation cache. First compile of the full train step
is tens of minutes through the tunneled backend; the on-disk cache makes
every subsequent process start near-instant. Called by all entry points."""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/jax_comp_cache")


def enable_persistent_cache(path: str = _DEFAULT) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
