"""Live full-model EfficientViT-SAM parity: the spec-written torch mirror
(tests/torch_sam.py) vs the JAX model through the REAL port mapper, at a
fresh weight seed (independent of the committed-golden manifest, which
freezes mirror outputs — this catches drift in EITHER side).

Reference semantics being mirrored: the EfficientViTSamPredictor flow the
extraction pipeline runs five times per frame
(/root/reference/extract_dataset.py:60-90, efficientvit sam.py:193-258).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edgestyle_tpu.core import porting
from edgestyle_tpu.models.efficientvit.backbone import BackboneConfig
from edgestyle_tpu.models.efficientvit.sam import (
    EfficientViTSam,
    SamConfig,
    port_sam_state_dict,
)
from tests import golden_mirror as gm

torch = pytest.importorskip("torch")


def test_sam_fullmodel_live_parity():
    from tests.torch_sam import EfficientViTSamT

    c = gm.SAM_MID
    tmod = EfficientViTSamT(c["widths"], c["depths"], c["neck_depth"])
    shapes = {k: list(v.shape) for k, v in tmod.state_dict().items()}
    sd = gm.synth_state_dict(shapes, seed=20260817)
    tmod.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    tmod.eval()

    cfg = SamConfig(
        backbone=BackboneConfig(width_list=tuple(c["widths"]),
                                depth_list=tuple(c["depths"])),
        neck_depth=c["neck_depth"], image_size=c["image_size"],
    )
    params = porting.unflatten(port_sam_state_dict(sd, cfg))
    sam = EfficientViTSam(cfg)

    rng = np.random.default_rng(9)
    img = rng.standard_normal((2, 3, c["image_size"], c["image_size"])).astype(
        np.float32
    )
    pts = np.array([[[180.0, 220.0], [900.0, 870.0]],
                    [[400.0, 330.0], [0.0, 0.0]]], np.float32)
    lbl = np.array([[2, 3], [1, -1]], np.int64)
    with torch.no_grad():
        want_m, want_iou = tmod(torch.from_numpy(img), torch.from_numpy(pts),
                                torch.from_numpy(lbl), True)

    got_m, got_iou = jax.jit(
        lambda p, x, pt, lb: sam.apply({"params": p}, x, pt, lb, True)
    )(params, jnp.asarray(np.transpose(img, (0, 2, 3, 1))), jnp.asarray(pts),
      jnp.asarray(lbl))

    scale = float(np.abs(want_m.numpy()).max())
    assert scale > 1.0  # non-degenerate logits
    np.testing.assert_allclose(
        np.asarray(got_m), want_m.numpy(), atol=2e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(got_iou), want_iou.numpy(), atol=1e-4 * max(
            1.0, float(np.abs(want_iou.numpy()).max()))
    )
