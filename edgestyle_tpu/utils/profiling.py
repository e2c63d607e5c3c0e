"""Tracing / profiling utilities (SURVEY.md §5: the reference has no
tracer — only fvcore FLOP counting at ONNX export, export_onnx.py:167-171.
Here profiling is first-class: Perfetto traces via jax.profiler, analytic
FLOP counts from the compiled HLO, and honest wall-clock timing that works
around the axon tunnel's non-blocking block_until_ready)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/edgestyle_trace"):
    """Capture a Perfetto/TensorBoard trace of the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def compiled_flops(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Analytic cost of the jitted fn from XLA's cost model."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
    }


def timeit(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> float:
    """Median wall-clock seconds per call with forced host readback (the
    axon tunnel's block_until_ready returns early; reading a scalar back
    is the only reliable fence)."""

    def sync(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def mxu_utilization(flops: float, seconds: float, peak_tflops: float = 197.0) -> float:
    """Fraction of bf16 peak (v5e ≈ 197 TFLOP/s)."""
    return flops / seconds / (peak_tflops * 1e12)


# ------------------------------------------------ scan-amortized probing
# The axon tunnel adds a ~27-30 ms fixed floor to every dispatch, so small
# programs must be probed as a 20-iteration lax.scan inside ONE jitted
# program (BASELINE.md "Profiling note"). Round-2 traces showed even this
# reads up to ~8x the true device time for tiny custom-call programs —
# treat results as upper bounds and prefer device traces of the real
# program (scripts/trace_pipeline.py).
SCAN_STEPS = 20
TUNNEL_FLOOR_MS = 27.0


def scan_probe(body, steps: int = SCAN_STEPS):
    """jit a `steps`-iteration scan of body(x, *args) whose carry mixes in
    the output so XLA cannot hoist the body out of the loop."""
    import jax.numpy as jnp

    def run(x, *args):
        def step(carry, _):
            out = body(carry, *args)
            flat = jnp.ravel(out)[:1].astype(carry.dtype)
            return carry + flat * 1e-6, ()

        final, _ = jax.lax.scan(step, x, jnp.arange(steps))
        return final

    return jax.jit(run)


def ms_per_scan_step(fn, *args, iters: int = 3, steps: int = SCAN_STEPS) -> float:
    """Floor-corrected milliseconds per scan step of a scan_probe program."""
    t = timeit(fn, *args, iters=iters)
    return max(t * 1e3 - TUNNEL_FLOOR_MS, 0.0) / steps
