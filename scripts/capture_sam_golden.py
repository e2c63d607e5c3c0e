"""Capture committed goldens for the full-model EfficientViT-SAM torch
mirror (tests/torch_sam.py) at the SAM_MID config.

Same contract as capture_mirror_goldens.py: weights/inputs regenerate
from seeds (tests/golden_mirror.py); only mirror OUTPUTS + the shape
manifest are written (tests/goldens/sam_v1.npz / sam_v1_shapes.json).
The torch-free gate is tests/test_goldens_committed.py::test_sam_*.

Usage:  python scripts/capture_sam_golden.py
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon plugin ignores the env var

import torch  # noqa: E402

from tests import golden_mirror as gm  # noqa: E402
from tests.torch_sam import EfficientViTSamT  # noqa: E402


def main():
    os.makedirs(gm.GOLDEN_DIR, exist_ok=True)
    cfg = gm.SAM_MID
    tmod = EfficientViTSamT(cfg["widths"], cfg["depths"], cfg["neck_depth"])
    shapes = {"sam_mid": {k: list(v.shape) for k, v in tmod.state_dict().items()}}
    sd = gm.synth_state_dict(shapes["sam_mid"])
    tmod.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    tmod.eval()

    img, box_pts, box_lbl, pt_pts, pt_lbl = gm.sam_inputs()
    out = {}
    with torch.no_grad():
        emb = tmod.image_encoder(torch.from_numpy(img))
        masks, iou = tmod(torch.from_numpy(img), torch.from_numpy(box_pts),
                          torch.from_numpy(box_lbl), True)
        masks1, iou1 = tmod(torch.from_numpy(img), torch.from_numpy(pt_pts),
                            torch.from_numpy(pt_lbl), False)
    out["sam_mid.emb_slice"] = emb[:, ::32, ::8, ::8].numpy()  # (1,8,8,8)
    out["sam_mid.box_masks"] = masks.numpy()
    out["sam_mid.box_iou"] = iou.numpy()
    out["sam_mid.pt_mask"] = masks1.numpy()
    out["sam_mid.pt_iou"] = iou1.numpy()

    np.savez_compressed(gm.SAM_GOLDENS_NPZ, **out)
    with open(gm.SAM_SHAPES_JSON, "w") as f:
        json.dump(shapes, f, sort_keys=True)
    size = os.path.getsize(gm.SAM_GOLDENS_NPZ) / 1e6
    print(f"wrote {gm.SAM_GOLDENS_NPZ} ({size:.2f} MB, {len(out)} tensors); "
          f"mask logits |max| = {np.abs(out['sam_mid.box_masks']).max():.2f}")


if __name__ == "__main__":
    main()
