"""Recipe-shape training soak on the real chip (VERDICT r4 item 4).

The reference's implicit perf envelope is 20k steps at bs2 x ga32 with
loss / Prodigy-`d` curves as the artifact
(/root/reference/README.md:66-105). This soak runs the SAME recipe shape
(bs2 x ga32 = 64 samples/optimizer-step, 512 px, Prodigy lr 1.0,
snr_gamma 5) through the real trainer CLI — real dataset pipeline
(CollateFn/augment/prefetch), checkpoint rotation, and a REAL mid-run
interruption: phase A is SIGTERMed as soon as its second checkpoint
lands, phase B resumes from `latest` and finishes. Data is synthetic
512 px noise (no network in this image), so the loss floor is the
unlearnable-noise floor — the soak validates hours-scale trainer
mechanics + s/step on the wedge-prone tunnel, not model quality.

Outputs (docs/experiments/train_soak_r5/): soak_summary.json,
phaseA.log / phaseB.log (the JSON step lines), and the curve data for
docs/train_soak_r5.svg (plotted by scripts/plot_soak.py).

Usage: python scripts/train_soak.py [--steps 300] [--ckpt_every 50]
           [--out docs/experiments/train_soak_r5]
"""

import argparse
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_dataset(root, subjects=8, frames=4, px=512, seed=0):
    """Reference-layout synthetic dataset: per-subject artifact dirs
    (processed/openpose/subject/agnostic/head/clothes), `frames` frames
    each → subjects x P(frames,3) training pairs."""
    from PIL import Image

    arts = ("processed", "openpose", "subject", "agnostic", "head", "clothes")
    g = np.random.default_rng(seed)
    for s in range(subjects):
        for a in arts:
            d = os.path.join(root, f"s{s}", a)
            os.makedirs(d, exist_ok=True)
            for f in range(frames):
                img = g.integers(0, 255, (px, px, 3), dtype=np.uint8)
                Image.fromarray(img).save(os.path.join(d, f"f{f}.jpg"))
    return root


def run_phase(cmd, log_path, kill_after_ckpt=None, out_dir=None,
              timeout_s=14400):
    """Run a trainer phase, streaming stdout to log_path. With
    kill_after_ckpt=k: poll for checkpoint-<k> and SIGTERM the trainer
    once it exists (the mid-run interruption)."""
    t0 = time.time()
    with open(log_path, "w") as log:
        proc = subprocess.Popen(cmd, cwd=REPO, stdout=log,
                                stderr=subprocess.STDOUT)
        killed = False
        while proc.poll() is None:
            if time.time() - t0 > timeout_s:
                proc.kill()
                raise RuntimeError(f"phase timed out after {timeout_s}s")
            if kill_after_ckpt is not None and not killed and os.path.isdir(
                os.path.join(out_dir, f"checkpoint-{kill_after_ckpt}")
            ):
                time.sleep(5)  # let the round-trip verify finish writing
                proc.send_signal(signal.SIGTERM)
                killed = True
            time.sleep(5)
    return time.time() - t0, (proc.returncode if not killed else "SIGTERM")


def parse_log(path):
    rows = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    rows.append(json.loads(ln))
                except ValueError:
                    pass
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--ckpt_every", type=int, default=50)
    ap.add_argument("--bs", type=int, default=2,
                    help="micro batch (reference recipe: 2). bs2 x ga32 @ "
                         "512px measured 18.30G HBM demand vs the chip's "
                         "15.75G even with --gradient_checkpointing — on "
                         "ONE v5e chip run bs1 (the same per-chip shape "
                         "DP-2 gives the full recipe)")
    ap.add_argument("--ga", type=int, default=32)
    ap.add_argument("--data_dir", type=str, default="/tmp/soak_data")
    ap.add_argument("--train_dir", type=str, default="/tmp/soak_out")
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "docs", "experiments",
                                         "train_soak_r5"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    if not os.path.isdir(args.data_dir):
        print("building synthetic 512px dataset...", flush=True)
        make_dataset(args.data_dir)

    base = [
        sys.executable, "-m", "edgestyle_tpu.apps.train",
        "--random_init", "--dataset_dir", args.data_dir,
        "--resolution", "512",
        "--train_batch_size", str(args.bs),
        "--gradient_accumulation_steps", str(args.ga),
        "--optimizer", "prodigy", "--learning_rate", "1.0",
        "--snr_gamma", "5.0", "--gradient_checkpointing",
        "--num_train_epochs", "100000",
        "--max_train_steps", str(args.steps),
        "--checkpointing_steps", str(args.ckpt_every),
        "--checkpoints_total_limit", "2",
        "--logging_steps", "1",
        "--dataloader_num_workers", "2",
        "--output_dir", args.train_dir,
        "--seed", "0",
    ]

    # phase A: run until the SECOND checkpoint lands, then SIGTERM
    kill_at = 2 * args.ckpt_every
    a_log = os.path.join(args.out, "phaseA.log")
    print(f"phase A: training to be interrupted at checkpoint-{kill_at}",
          flush=True)
    a_wall, a_rc = run_phase(base, a_log, kill_after_ckpt=kill_at,
                             out_dir=args.train_dir)
    a_rows = [r for r in parse_log(a_log) if "step" in r]
    assert a_rows, "phase A produced no step lines"
    print(f"phase A: {len(a_rows)} steps logged, rc={a_rc}, "
          f"wall={a_wall:.0f}s", flush=True)

    # phase B: resume from latest, run to the full budget
    b_log = os.path.join(args.out, "phaseB.log")
    print("phase B: resuming from latest", flush=True)
    b_wall, b_rc = run_phase(base + ["--resume_from_checkpoint", "latest"],
                             b_log)
    b_rows = [r for r in parse_log(b_log) if "step" in r]
    assert b_rows, "phase B produced no step lines"
    done = [r for r in parse_log(b_log) if r.get("done")]
    assert done and done[0]["final_step"] >= args.steps, done

    # invariants: resume continued AFTER the interruption point (no
    # restart-from-zero), rotation kept <= 2 checkpoint dirs
    first_b = b_rows[0]["step"]
    assert first_b > kill_at - args.ckpt_every, (first_b, kill_at)
    ckpts = sorted(
        int(d.split("-")[1]) for d in os.listdir(args.train_dir)
        if d.startswith("checkpoint-")
    )
    assert len(ckpts) <= 2, ckpts
    losses = [r["loss"] for r in a_rows + b_rows]
    assert all(np.isfinite(losses)), "non-finite loss during soak"

    steps_total = len(a_rows) + len(b_rows)
    # s/step from phase B's steady tail (phase A pays the big compile)
    tail = b_rows[max(1, len(b_rows) // 2):]
    if len(tail) >= 2:
        s_per_step = (tail[-1]["elapsed_s"] - tail[0]["elapsed_s"]) / (
            len(tail) - 1)
    else:
        s_per_step = b_wall / max(1, len(b_rows))
    spp = args.bs * args.ga
    summary = {
        "recipe": f"bs{args.bs} x ga{args.ga}, 512px, prodigy lr 1.0, "
                  "snr_gamma 5, gradient checkpointing (reference recipe "
                  "README.md:66-96 is bs2 x ga32; see --bs help for the "
                  "measured single-chip HBM ceiling)",
        "steps_total": steps_total,
        "interrupted_at_checkpoint": kill_at,
        "resumed_first_logged_step": first_b,
        "checkpoints_kept": ckpts,
        "phaseA_wall_s": round(a_wall, 1), "phaseB_wall_s": round(b_wall, 1),
        "s_per_step_steady": round(s_per_step, 2),
        "s_per_sample_steady": round(s_per_step / spp, 4),
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
        "d_first": a_rows[0]["d"], "d_last": b_rows[-1]["d"],
    }
    with open(os.path.join(args.out, "soak_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
