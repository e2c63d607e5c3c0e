"""Weight-porting layer: HF/torch state dicts → JAX NHWC pytrees.

The reference loads every model through HF ``from_pretrained``
(SURVEY.md §2.6 lists the nine external checkpoints). We load the same
safetensors files but re-lay them out for TPU:

  * Conv2d weight  OIHW  → HWIO   (NHWC convs feed the MXU directly)
  * Linear weight  (out,in) → (in,out)
  * Norm scale/bias unchanged

Each model module ships a ``port_*`` function that maps torch key paths to
its flax param tree using these primitives. Porting never touches the
compute path; it is pure host-side numpy.
"""

from __future__ import annotations

import re
from typing import Callable, Dict, Mapping

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def load_safetensors(path: str) -> StateDict:
    from safetensors.numpy import load_file

    return dict(load_file(path))


def load_torch_state_dict(module) -> StateDict:
    """Pull a live torch module's state dict to numpy (used by parity tests)."""
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def load_torch_checkpoint(path: str) -> StateDict:
    """torch .pt/.pth/.ckpt pickle → numpy state dict.

    Handles the layouts the reference saves (efficientvit
    network.py:69-74 load, segmenter_training_*.py:463-464 save): a raw
    ``state_dict()`` or a dict wrapping one under ``"state_dict"``.
    Weights-only unpickling — full-module pickles (which would need the
    original torch classes importable) are rejected with a clear error.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:
        raise ValueError(
            f"{path}: not a weights-only torch checkpoint ({e}). If this is "
            "a pickled nn.Module, run torch.save(module.state_dict(), ...) "
            "in an env with the original classes, or convert with "
            "python -m edgestyle_tpu.apps.convert_checkpoint."
        ) from e
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if not isinstance(ckpt, dict):
        raise ValueError(f"{path}: expected a state dict, got {type(ckpt)}")
    out = {}
    for k, v in ckpt.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def load_state_dict(path: str) -> StateDict:
    """Load a checkpoint by extension: .safetensors or torch pickle."""
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_torch_checkpoint(path)


def conv_kernel(w: Array) -> Array:
    """torch Conv2d weight (O, I, kH, kW) → flax (kH, kW, I, O)."""
    if w.ndim != 4:
        raise ValueError(f"expected 4-D conv weight, got {w.shape}")
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: Array) -> Array:
    """torch Linear weight (out, in) → flax (in, out)."""
    if w.ndim != 2:
        raise ValueError(f"expected 2-D linear weight, got {w.shape}")
    return np.transpose(w, (1, 0))


def conv_transpose_kernel(w: Array) -> Array:
    """torch ConvTranspose2d weight (I, O, kH, kW) → flax (kH, kW, I, O).

    flax ConvTranspose with ``transpose_kernel=False`` contracts the *input*
    channel on axis 2, so torch's layout needs axis-2=I, axis-3=O — plus the
    spatial flip torch applies implicitly.
    """
    if w.ndim != 4:
        raise ValueError(f"expected 4-D conv-transpose weight, got {w.shape}")
    w = np.transpose(w, (2, 3, 0, 1))  # (kH, kW, I, O)
    return w[::-1, ::-1]


class KeyMapper:
    """Declarative torch-key → flax-path mapper.

    Rules are (regex, template, transform) triples. Template may reference
    regex groups with \\1-style backrefs. Unmatched torch keys raise at the
    end so a port never silently drops weights.
    """

    def __init__(self):
        self.rules = []

    def rule(self, pattern: str, template: str, transform: Callable[[Array], Array] = None):
        self.rules.append((re.compile(pattern), template, transform))
        return self

    def conv(self, pattern: str, template: str):
        return self.rule(pattern + r"\.weight", template + ".kernel", conv_kernel).rule(
            pattern + r"\.bias", template + ".bias"
        )

    def linear(self, pattern: str, template: str):
        return self.rule(pattern + r"\.weight", template + ".kernel", linear_kernel).rule(
            pattern + r"\.bias", template + ".bias"
        )

    def norm(self, pattern: str, template: str):
        return self.rule(pattern + r"\.weight", template + ".scale").rule(
            pattern + r"\.bias", template + ".bias"
        )

    def apply(self, sd: Mapping[str, Array], strict: bool = True) -> Dict[str, Array]:
        out: Dict[str, Array] = {}
        unmatched = []
        for k, v in sd.items():
            for pat, template, transform in self.rules:
                m = pat.fullmatch(k)
                if m:
                    new_key = m.expand(template)
                    out[new_key] = transform(v) if transform else np.asarray(v)
                    break
            else:
                unmatched.append(k)
        if unmatched and strict:
            raise KeyError(f"unported torch keys ({len(unmatched)}): {unmatched[:10]}")
        return out


def unflatten(flat: Mapping[str, Array], sep: str = ".") -> Dict:
    """'a.b.c' → nested dicts. Numeric components stay string keys ('0', '1')
    to match flax's repr of list submodules (layers_0 style callers should
    pre-rename)."""
    tree: Dict = {}
    for k, v in flat.items():
        parts = k.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def flatten(tree, prefix: str = "", sep: str = ".") -> Dict[str, Array]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, Mapping):
            out.update(flatten(v, key, sep))
        else:
            out[key] = v
    return out
