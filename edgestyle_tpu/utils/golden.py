"""Golden-tensor parity harness (SURVEY.md §7 stage 1).

Workflow: on any machine with the reference's torch stack, capture
intermediate activations to .npz with `save_goldens`; here, `GoldenSuite`
replays our modules against them with per-tensor tolerances and a summary
report. Conventions: NCHW goldens are transposed to NHWC on load when
`nchw=True`; names are free-form keys agreed between capture and replay
(e.g. "vae.encoder.moments", "unet.down0.res0").
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, List

import numpy as np


def save_goldens(path: str, tensors: Dict[str, np.ndarray]) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in tensors.items()})
    return path


@dataclasses.dataclass
class GoldenResult:
    name: str
    max_abs: float
    mean_abs: float
    passed: bool


class GoldenSuite:
    def __init__(self, path: str, nchw: bool = True):
        self.data = dict(np.load(path))
        self.nchw = nchw
        self.results: List[GoldenResult] = []

    def get(self, name: str) -> np.ndarray:
        x = self.data[name]
        if self.nchw and x.ndim == 4:
            x = np.transpose(x, (0, 2, 3, 1))
        return x

    def check(self, name: str, ours, atol: float = 1e-4, rtol: float = 1e-4) -> GoldenResult:
        ref = self.get(name)
        ours = np.asarray(ours, np.float32)
        diff = np.abs(ours - ref.astype(np.float32))
        ok = bool(np.all(diff <= atol + rtol * np.abs(ref)))
        res = GoldenResult(name, float(diff.max()), float(diff.mean()), ok)
        self.results.append(res)
        return res

    def report(self) -> str:
        lines = [
            f"{'PASS' if r.passed else 'FAIL'}  {r.name:40s} max={r.max_abs:.3e} mean={r.mean_abs:.3e}"
            for r in self.results
        ]
        n_fail = sum(not r.passed for r in self.results)
        lines.append(f"{len(self.results) - n_fail}/{len(self.results)} passed")
        return "\n".join(lines)

    @property
    def all_passed(self) -> bool:
        return all(r.passed for r in self.results)


CAPTURE_SNIPPET = r"""
# Run next to the reference (torch + diffusers) to capture goldens:
#
#   import torch, numpy as np
#   from diffusers import AutoencoderKL, UNet2DConditionModel
#   torch.manual_seed(0)
#   vae = AutoencoderKL.from_pretrained("stabilityai/sd-vae-ft-mse").eval()
#   x = torch.randn(1, 3, 512, 512)
#   with torch.no_grad():
#       moments = vae.encode(x).latent_dist.parameters
#   np.savez_compressed("goldens.npz",
#       **{"vae.input": x.numpy(), "vae.moments": moments.numpy()})
#
# then here:
#   suite = GoldenSuite("goldens.npz")
#   mean, logvar = our_vae.apply(params, suite.get("vae.input"), method=...)
#   suite.check("vae.moments", np.concatenate([...], -1))
"""
