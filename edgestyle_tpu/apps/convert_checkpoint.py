"""torch-pickle → safetensors checkpoint converter.

The reference distributes EfficientViT-SAM weights as torch pickles
(l2.pt + 4 finetuned trained_model_*.pt, extract_dataset.py:44-49). The
TPU apps load either format directly (core.porting.load_state_dict);
this CLI converts once so deployments never unpickle at startup.

Usage:
  python -m edgestyle_tpu.apps.convert_checkpoint src.pt dst.safetensors
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(src: str, dst: str) -> int:
    from safetensors.numpy import save_file

    from edgestyle_tpu.core import porting

    sd = porting.load_torch_checkpoint(src)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, dst)
    return len(sd)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("src", help="torch checkpoint (.pt/.pth/.ckpt)")
    p.add_argument("dst", help="output .safetensors path")
    args = p.parse_args(argv)
    n = convert(args.src, args.dst)
    print(f"wrote {args.dst} ({n} tensors)")


if __name__ == "__main__":
    main()
