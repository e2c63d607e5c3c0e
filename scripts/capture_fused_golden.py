"""Capture the committed fused-tryon end-to-end golden (VERDICT r3 item 7).

Runs the fully seeded tiny photos→try-on program (tests/fused_golden.py)
on the CPU backend at highest matmul precision — the same environment the
suite's checker uses — and writes tests/goldens/fused_tryon_v1.npz.

Run from the repo root: ``python scripts/capture_fused_golden.py``.
Re-capture ONLY on an intentional behavior change, and say why in the
commit message (the point of the golden is that drift fails the suite).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402

from tests.fused_golden import GOLDEN_NPZ, run_fused  # noqa: E402

out = run_fused()
os.makedirs(os.path.dirname(GOLDEN_NPZ), exist_ok=True)
np.savez_compressed(GOLDEN_NPZ, tryon=out)
print(f"wrote {GOLDEN_NPZ}: shape={out.shape} mean={out.mean():.6f} "
      f"std={out.std():.6f}")
