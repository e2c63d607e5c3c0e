"""Deployment export: serialized StableHLO with numeric parity asserts.

The reference's deployment path exports UNet+MultiControlNet to ONNX with
a full-graph check and a CPU-ORT parity assert rtol 1e-3 / atol 1e-5
(/root/reference/export_onnx.py:182-334; README.md:237-251 records that
tolerance actually failing at 17.8% mismatch). The TPU-native equivalent
serializes the jitted program itself via jax.export — the deployed
artifact runs the exact compiled computation, so parity is exact by
construction; we still assert it, keeping the reference's invariant."""

from __future__ import annotations

import os
from typing import Any, Callable, Sequence

import jax
import numpy as np


def export_program(
    fn: Callable, example_args: Sequence[Any], path: str,
    rtol: float = 1e-3, atol: float = 1e-5,
) -> str:
    """Serialize jit(fn) for the current platform, then reload and assert
    numeric parity on the example inputs (reference export_onnx.py:311-334
    semantics)."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)

    reloaded = jexport.deserialize(blob)
    ref = jax.jit(fn)(*example_args)
    out = reloaded.call(*example_args)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), rtol=rtol, atol=atol
        )
    return path


def load_program(path: str):
    """Reload a serialized program; returns an object with .call(*args)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def flop_report(fn: Callable, *example_args) -> dict:
    """FLOP/byte report of the jitted program (the reference FLOP-counts
    at export via fvcore, export_onnx.py:167-171)."""
    from edgestyle_tpu.utils.profiling import compiled_flops

    return compiled_flops(fn, *example_args)
