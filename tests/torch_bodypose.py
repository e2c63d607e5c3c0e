"""Full-model torch mirror of the CMU body_pose_model (the network
controlnet_aux's OpenposeDetector runs — reference substrate,
/root/reference/extract_dataset.py:58).

Written from the published CMU/pytorch-openpose architecture spec, NOT
from the JAX code: VGG-10 trunk → stage 1 two-branch (3×3 convs) → five
refine stages (7×7 convs) over concat(paf, heat, features). Attribute
names are chosen so ``state_dict()`` emits the exact
`model0.conv1_1.weight` / `model{s}_{L}.Mconv{i}_stage{s}_L{L}.weight`
keys that `port_bodypose_state_dict` consumes from the real
body_pose_model.pth — so full-model parity also exercises the port mapper
(tier C in PARITY.md; block-level pinning lives in tests/test_openpose.py).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn

NUM_PAF, NUM_HEAT = 38, 19


class _NamedConvs(nn.Module):
    """Submodule whose conv attributes carry CMU layer names."""

    def __init__(self, specs):
        super().__init__()
        self.order = [name for name, *_ in specs]
        for name, cin, cout, k in specs:
            setattr(self, name, nn.Conv2d(cin, cout, k, padding=k // 2))

    def run(self, x, relu_last=False):
        n = len(self.order)
        for i, name in enumerate(self.order):
            x = getattr(self, name)(x)
            if i < n - 1 or relu_last:
                x = F.relu(x)
        return x


def _stage1(L):
    return _NamedConvs([
        (f"conv5_1_CPM_L{L}", 128, 128, 3),
        (f"conv5_2_CPM_L{L}", 128, 128, 3),
        (f"conv5_3_CPM_L{L}", 128, 128, 3),
        (f"conv5_4_CPM_L{L}", 128, 512, 1),
        (f"conv5_5_CPM_L{L}", 512, NUM_PAF if L == 1 else NUM_HEAT, 1),
    ])


def _refine(s, L):
    cin = NUM_PAF + NUM_HEAT + 128
    return _NamedConvs(
        [(f"Mconv1_stage{s}_L{L}", cin, 128, 7)]
        + [(f"Mconv{i}_stage{s}_L{L}", 128, 128, 7) for i in range(2, 6)]
        + [
            (f"Mconv6_stage{s}_L{L}", 128, 128, 1),
            (f"Mconv7_stage{s}_L{L}", 128, NUM_PAF if L == 1 else NUM_HEAT, 1),
        ]
    )


class BodyPoseCMU(nn.Module):
    def __init__(self):
        super().__init__()
        self.model0 = _NamedConvs([
            ("conv1_1", 3, 64, 3), ("conv1_2", 64, 64, 3),
            ("conv2_1", 64, 128, 3), ("conv2_2", 128, 128, 3),
            ("conv3_1", 128, 256, 3), ("conv3_2", 256, 256, 3),
            ("conv3_3", 256, 256, 3), ("conv3_4", 256, 256, 3),
            ("conv4_1", 256, 512, 3), ("conv4_2", 512, 512, 3),
            ("conv4_3_CPM", 512, 256, 3), ("conv4_4_CPM", 256, 128, 3),
        ])
        for L in (1, 2):
            setattr(self, f"model1_{L}", _stage1(L))
            for s in range(2, 7):
                setattr(self, f"model{s}_{L}", _refine(s, L))

    def forward(self, x):
        """x: (B, 3, H, W) in [-0.5, 0.5] → (paf (B,38,H/8,W/8), heat (B,19,...))."""
        m0 = self.model0
        pool = lambda y: F.max_pool2d(y, 2)
        r = F.relu
        x = r(m0.conv1_1(x)); x = r(m0.conv1_2(x)); x = pool(x)
        x = r(m0.conv2_1(x)); x = r(m0.conv2_2(x)); x = pool(x)
        x = r(m0.conv3_1(x)); x = r(m0.conv3_2(x))
        x = r(m0.conv3_3(x)); x = r(m0.conv3_4(x)); x = pool(x)
        x = r(m0.conv4_1(x)); x = r(m0.conv4_2(x))
        x = r(m0.conv4_3_CPM(x)); feat = r(m0.conv4_4_CPM(x))

        paf = self.model1_1.run(feat)
        heat = self.model1_2.run(feat)
        for s in range(2, 7):
            inp = torch.cat([paf, heat, feat], dim=1)
            paf = getattr(self, f"model{s}_1").run(inp)
            heat = getattr(self, f"model{s}_2").run(inp)
        return paf, heat
