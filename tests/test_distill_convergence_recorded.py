"""Pins the RECORDED distillation-convergence results (VERDICT r3 item 2).

scripts/distill_convergence.py runs are archived under
docs/experiments/distill_convergence_r4/*.jsonl; this checker re-parses
them every suite run so the claims stay machine-visible:

1. POSITIVE: with a structured (pretrained) teacher, the guidance-mode
   student climbs decisively above the fresh-adapter control on BOTH the
   train and held-out conditioning sets — the distillation loss teaches
   the student the teacher's map in the regime distillation targets.
2. NEGATIVE CONTROL: against a RANDOM-INIT teacher the same machinery
   measures flat (two lrs) — the CFG delta of a random net is a chaotic
   feature map with no learnable low-rank structure. This is why the
   serving-quality story requires trained/structured weights, not why the
   machinery is broken (the loss math is exercised by tests/test_lcm.py).

Re-run the experiments with scripts/distill_convergence.py; replace the
archives only with a fresh run's output and update this test's thresholds
only if the experimental setup itself changed.
"""

import json
import os

import pytest

EXP_DIR = os.path.join(os.path.dirname(__file__), "..", "docs",
                       "experiments", "distill_convergence_r4")


def _load(name):
    path = os.path.join(EXP_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} missing — run scripts/distill_convergence.py")
    with open(path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    summary = [r for r in rows if r.get("summary")]
    assert len(summary) == 1, f"{name}: expected one summary row"
    return rows, summary[0]


def test_structured_teacher_guidance_student_climbs():
    rows, s = _load("guidance_structured_teacher.jsonl")
    base = s["baseline_fresh_adapters"]
    final = s["final"]
    # decisive climb on BOTH sets (measured: 0.887→0.989 train,
    # 0.906→0.929 holdout, best_train 0.994)
    assert final["ssim_train"] > base["ssim_train"] + 0.05
    assert final["ssim_holdout"] > base["ssim_holdout"] + 0.015
    assert s["best_ssim_train"] > 0.97
    # train MAE at least halved
    assert final["mae_train"] < base["mae_train"] * 0.5
    # the climb is sustained, not a lucky final point: every recorded
    # eval after step 0 beats the baseline on the train set
    evals = [r for r in rows if r.get("step", 0) > 0 and "ssim_train" in r]
    assert len(evals) >= 5
    assert all(r["ssim_train"] > base["ssim_train"] + 0.05 for r in evals)


@pytest.mark.parametrize("name", [
    "guidance_random_teacher_lr1e-3.jsonl",
    "guidance_random_teacher_lr1e-2_rank32.jsonl",
])
def test_random_teacher_guidance_is_flat_negative_control(name):
    rows, s = _load(name)
    base = s["baseline_fresh_adapters"]
    # the recorded finding: NO decisive climb against a random teacher
    # (best-ever train SSIM stays within noise of the fresh-adapter
    # control) — if a re-run ever climbs here, the archived analysis in
    # BASELINE.md needs revisiting, so fail loudly
    assert s["best_ssim_train"] < base["ssim_train"] + 0.02


def test_consistency_loss_descends():
    rows, s = _load("consistency_random_teacher.jsonl")
    losses = [r["loss"] for r in rows
              if r.get("loss") is not None and "summary" not in r]
    assert len(losses) >= 5
    # bootstrap objective itself is learnable even on the random teacher:
    # min recorded loss well below the first recorded loss
    assert min(losses) < losses[0] * 0.6


R5_DIR = os.path.join(os.path.dirname(__file__), "..", "docs",
                      "experiments", "distill_convergence_r5")


def _load_r5(name):
    path = os.path.join(R5_DIR, name)
    if not os.path.exists(path):
        pytest.skip(f"{name} missing — run scripts/distill_convergence.py")
    with open(path) as f:
        rows = [json.loads(ln) for ln in f if ln.strip()]
    summary = [r for r in rows if r.get("summary")]
    assert len(summary) == 1
    return rows, summary[0]


@pytest.mark.parametrize("name", [
    "consistency_grid8_lr1e-3_r16.jsonl",
    "consistency_grid8_lr3e-4_r64_ema098.jsonl",
])
def test_r5_consistency_sweep_is_flat_and_demotes_lcm_headline(name):
    """VERDICT r4 item 3 close-out (BASELINE.md "Round-5 consistency-mode
    close-out"): the structured-teacher consistency sweep (coarse grid 8,
    lr/rank/EMA varied) stays at the fresh-adapter floor through 2000-3000
    updates — the recorded basis for keeping `--mode lcm` speed-only. If a
    re-run ever climbs, promote the mode and update BASELINE.md."""
    rows, s = _load_r5(name)
    base = s["baseline_fresh_adapters"]
    assert s["pretrain_teacher_steps"] >= 2000  # structured-teacher regime
    assert s["num_ddim_timesteps"] == 8  # the shortened bootstrap chain
    assert s["best_ssim_train"] < base["ssim_train"] + 0.02  # flat


def test_r5_cfgoff_control_localizes_the_gap():
    """The control that cleared the sampler: a few-step CFG-OFF UniPC on
    the same teacher/seeds scores high while fresh-adapter LCM is at the
    floor — so the whole deficit is LCM's one-shot x̂0 jump at t≈T (which
    distillation at real scale exists to teach), not the serving path
    (tests/test_lcm.py::test_sampler_exact_under_perfect_model pins the
    sampler itself)."""
    rows, s = _load_r5("consistency_grid8_lr3e-4_r64_ema098.jsonl")
    assert s["control_unipc4_cfgoff_ssim_holdout"] > 0.85
    assert s["baseline_fresh_adapters"]["ssim_holdout"] < 0.3
