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


R5_PATH = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "experiments", "steered_quality_r5.jsonl")
FRONT = [0, 1, 2, 4, 7, 11, 16]


@pytest.fixture(scope="module")
def r5_rows():
    if not os.path.exists(R5_PATH):
        pytest.skip("r5 composite archive missing")
    with open(R5_PATH) as f:
        return [json.loads(ln) for ln in f if ln.strip()]


def test_r5_preset_tiers_hold(rows, r5_rows):
    """VERDICT r4 item 2: the SHIPPED presets' steered SSIM meets their
    labeled tier, and every measured FASTER composite sits under the
    aggressive bar — the recorded basis for the r5 preset table
    (apps/tryon.py SERVING_MODES)."""
    # quality = cn k=2 (r4 single-lever row): >= 0.98
    k2 = _one(rows, cache_interval=2, cfg_interval=[0.0, 1.0], tome=0.0)
    assert k2["tryon_ssim_exact_vs_cached"] >= 0.98
    # conservative = ToMe alone (r4): >= 0.98
    tome = _one(rows, cache_interval=1, cfg_interval=[0.0, 1.0], tome=0.5)
    assert tome["tryon_ssim_exact_vs_cached"] >= 0.98
    # aggressive = front-loaded schedule alone (r4): >= 0.94
    fl = _one(rows, cache_steps=FRONT)
    assert fl["tryon_ssim_exact_vs_cached"] >= 0.94
    # the r5 composites that would be FASTER all miss the >= 0.94 bar —
    # which is why aggressive ships the schedule alone
    fl_cfg = _one(r5_rows, cache_steps=FRONT, cfg_interval=[0.0, 0.5])
    fl_tome = _one(r5_rows, cache_steps=FRONT, tome=0.5)
    cn2_tome = _one(r5_rows, cache_interval=2, tome=0.5)
    for r in (fl_cfg, fl_tome):
        assert r["cached_speedup"] > fl.get("cached_speedup", 1.55)
        assert r["tryon_ssim_exact_vs_cached"] < 0.94
    # cn k=2 + ToMe: meets 0.94 but is SLOWER than the schedule alone
    assert cn2_tome["tryon_ssim_exact_vs_cached"] >= 0.94
    assert cn2_tome["cached_speedup"] < 1.55
