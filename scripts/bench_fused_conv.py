"""A/B the fused GN+SiLU+conv3x3 Pallas kernel vs the XLA composition at
the SD1.5 trunk shapes (scan-20 method, see profile_breakdown.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edgestyle_tpu.ops import fused_conv as fc
from edgestyle_tpu.utils.profiling import ms_per_scan_step, scan_probe

scan20 = scan_probe
ms_per_step = ms_per_scan_step


def main():
    print(jax.default_backend(), jax.devices(), flush=True)
    g = np.random.default_rng(0)
    dt = jnp.bfloat16
    shapes = [(6, 64, 64, 320, 320), (6, 32, 32, 640, 640),
              (6, 16, 16, 1280, 1280), (6, 8, 8, 1280, 1280)]
    results = {}
    for (b, h, w, cin, cout) in shapes:
        x = jnp.asarray(g.standard_normal((b, h, w, cin)), dt)
        gamma = jnp.asarray(g.standard_normal(cin), jnp.float32)
        beta = jnp.asarray(g.standard_normal(cin), jnp.float32)
        k = jnp.asarray(g.standard_normal((3, 3, cin, cout)) * 0.02, jnp.float32)
        bias = jnp.asarray(g.standard_normal(cout), jnp.float32)

        def xla_chain(xx, ga, be, kk, bb):
            return fc._reference(xx, ga, be, kk, bb, 32, 1e-5, dt)

        def pallas_chain(xx, ga, be, kk, bb):
            return fc._fused(xx, ga, be, kk, bb, 32, 1e-5, dt)

        # correctness first (against the XLA chain, bf16 tolerance)
        ref = jax.jit(xla_chain)(x, gamma, beta, k, bias)
        out = jax.jit(pallas_chain)(x, gamma, beta, k, bias)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale_ = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))

        ms_x = ms_per_step(scan20(xla_chain), x, gamma, beta, k, bias)
        ms_p = ms_per_step(scan20(pallas_chain), x, gamma, beta, k, bias)
        fl = 2.0 * b * h * w * 9 * cin * cout
        key = f"{h}x{w}x{cin}"
        results[key] = {
            "xla_ms": round(ms_x, 3), "pallas_ms": round(ms_p, 3),
            "speedup": round(ms_x / ms_p, 2) if ms_p else None,
            "pallas_tflops": round(fl / ms_p / 1e9, 1) if ms_p else None,
            "xla_tflops": round(fl / ms_x / 1e9, 1),
            "max_err": err, "ref_scale": scale_,
        }
        print(key, results[key], flush=True)

    import json
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
