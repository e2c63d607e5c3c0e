"""Pins the RECORDED steered serving-quality table (VERDICT r3 item 3).

docs/experiments/steered_quality_r4.jsonl holds
scripts/quality_cached.py --trained rows measured on v5e-1 against
steering weights (scripts/steer_train.py, steer 42x the bf16 noise
floor). This checker re-asserts the physical orderings those weights
finally resolved — if a re-measure ever inverts them, the BASELINE.md
analysis needs revisiting, so fail loudly.
"""

import json
import os

import pytest

PATH = os.path.join(os.path.dirname(__file__), "..", "docs", "experiments",
                    "steered_quality_r4.jsonl")


@pytest.fixture(scope="module")
def rows():
    if not os.path.exists(PATH):
        pytest.skip("archive missing — run scripts/steered_quality_suite.sh")
    with open(PATH) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def _one(rows, **match):
    hits = [
        r for r in rows
        if all(r.get(k) == v for k, v in match.items())
    ]
    assert len(hits) == 1, f"{match}: {len(hits)} hits"
    return hits[0]


def test_cache_interval_ordering_resolved(rows):
    exact_cfg = {"cfg_interval": [0.0, 1.0], "tome": 0.0}
    k2 = _one(rows, cache_interval=2, **exact_cfg)
    k3 = _one(rows, cache_interval=3, **exact_cfg)
    # more refreshes -> closer to exact, by a margin far above the bf16
    # noise floor (~0.0007); r3's random-weight harness inverted this
    assert k2["tryon_ssim_exact_vs_cached"] > k3["tryon_ssim_exact_vs_cached"] + 0.01
    # both resolve well off the floor
    assert k3["tryon_ssim_exact_vs_cached"] < 0.99


def test_front_loaded_schedule_beats_uniform_at_same_budget(rows):
    k3 = _one(rows, cache_interval=3, cfg_interval=[0.0, 1.0], tome=0.0)
    fl = _one(rows, cache_steps=[0, 1, 2, 4, 7, 11, 16])
    # DeepCache §4.2: front-loading refreshes buys quality at the same
    # refresh count (both schedules have 7 refreshes)
    assert fl["tryon_ssim_exact_vs_cached"] > k3["tryon_ssim_exact_vs_cached"] + 0.01


def test_cfg_window_end_monotone(rows):
    ends = {}
    for r in rows:
        ci = r.get("cfg_interval")
        if ci and ci[1] < 1.0 and r.get("cache_interval") == 1 and not r["tome"]:
            ends[ci[1]] = r["tryon_ssim_exact_vs_cached"]
    assert {0.3, 0.4, 0.5} <= set(ends)
    # a longer guidance window diverges less from exact
    assert ends[0.5] > ends[0.4] > ends[0.3]
