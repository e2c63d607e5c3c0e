"""Flash-attention boundary investigation (VERDICT r1 item 8).

Round 1 measured raw device arrays fed DIRECTLY to the jitted flash
kernel as ~10x slower than the same kernel with compiler-produced
operands, and left it "unresolved, benign in-pipeline". This script
isolates the three candidate explanations on the real chip:

  a) layout: XLA inserts copy/transpose before the custom call when the
     operands are program parameters → visible in the optimized HLO;
  b) measurement artifact: the tunnel's ~27-30 ms dispatch floor + no
     scan amortization in the original measurement;
  c) genuine custom-call overhead per dispatch.

Also measures flash-vs-XLA at the 256- and 64-token attentions currently
gated to XLA (_pick_impl nq>=1024) to decide whether to extend the gate.

Usage: python scripts/flash_boundary.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from edgestyle_tpu.ops.attention import _xla_attention
from edgestyle_tpu.ops.flash import flash_attention
from edgestyle_tpu.utils.profiling import (
    ms_per_scan_step, scan_probe, timeit)

scan20 = scan_probe
ms_step = ms_per_scan_step


def main():
    print(jax.default_backend(), jax.devices(), flush=True)
    g = np.random.default_rng(0)
    results = {}

    # ------- boundary experiment at the hot trunk shape
    b, h, n, d = 6, 8, 4096, 40
    q = jnp.asarray(g.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(g.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(g.standard_normal((b, h, n, d)), jnp.bfloat16)
    scale = 1.0 / d**0.5

    raw = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
    produced = jax.jit(
        lambda q, k, v: flash_attention(q * 1.0000001, k * 1.0000001,
                                        v * 1.0000001, scale)
    )

    # single-dispatch timings (what round 1 measured)
    t_raw = timeit(raw, q, k, v, iters=5) * 1e3
    t_prod = timeit(produced, q, k, v, iters=5) * 1e3
    results["single_dispatch_ms"] = {"raw_args": round(t_raw, 2),
                                     "produced_args": round(t_prod, 2)}
    print(results["single_dispatch_ms"], flush=True)

    # scan-amortized timings (tunnel floor removed)
    t_raw20 = ms_step(scan20(lambda q, k, v: flash_attention(q, k, v, scale)), q, k, v)
    results["scan20_raw_carry_ms"] = round(t_raw20, 3)
    print("scan20 raw-carry:", t_raw20, flush=True)

    # HLO inspection: does the raw-args program copy/transpose before the call?
    hlo = raw.lower(q, k, v).compile().as_text()
    n_copy = hlo.count(" copy(")
    n_transpose = hlo.count(" transpose(")
    n_bitcast = hlo.count("bitcast")
    results["raw_hlo_ops"] = {"copy": n_copy, "transpose": n_transpose,
                              "bitcast_lines": n_bitcast}
    hlo2 = jax.jit(produced).lower(q, k, v).compile().as_text() if False else None
    print(results["raw_hlo_ops"], flush=True)

    # ------- flash vs xla at the gated-out small attentions
    for (bb, nn_, dd) in [(2, 256, 160), (6, 256, 160), (2, 1024, 80),
                          (2, 64, 160)]:
        qq = jnp.asarray(g.standard_normal((bb, 8, nn_, dd)), jnp.bfloat16)
        kk = jnp.asarray(g.standard_normal((bb, 8, nn_, dd)), jnp.bfloat16)
        vv = jnp.asarray(g.standard_normal((bb, 8, nn_, dd)), jnp.bfloat16)
        sc = 1.0 / dd**0.5
        t_flash = ms_step(
            scan20(lambda q, k, v: flash_attention(q, k, v, sc)), qq, kk, vv
        )
        t_xla = ms_step(
            scan20(lambda q, k, v: _xla_attention(q, k, v, sc)), qq, kk, vv
        )
        key = f"attn_b{bb}_n{nn_}_d{dd}"
        results[key] = {"flash_ms": round(t_flash, 4), "xla_ms": round(t_xla, 4)}
        print(key, results[key], flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
