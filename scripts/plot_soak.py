"""Plot the training-soak loss / Prodigy-`d` curves (VERDICT r4 item 4).

The reference publishes docs/train_loss.svg + docs/train_lr.svg
(README.md:100-105) as its training artifact; this renders our analog
from the soak logs (scripts/train_soak.py): two stacked panels sharing
the step axis — loss and Prodigy `d` are different scales, so they get
separate panels, never a dual axis. The phase-A→B boundary (SIGTERM +
resume-from-latest) is marked.

Usage: python scripts/plot_soak.py [--soak docs/experiments/train_soak_r5]
           [--out docs/train_soak_r5.svg]
"""

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# default data-viz palette (light mode): categorical slots 1-2, text inks,
# chart surface
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT_2 = "#52514e"
GRID = "#e4e3df"
SERIES_LOSS = "#2a78d6"  # slot 1 (blue)
SERIES_D = "#eb6834"     # slot 2 (orange)


def rows_of(path):
    out = []
    with open(path) as f:
        for ln in f:
            ln = ln.strip()
            if ln.startswith("{"):
                try:
                    r = json.loads(ln)
                except ValueError:
                    continue
                if "step" in r and "loss" in r:
                    out.append(r)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--soak", type=str,
                    default=os.path.join(REPO, "docs", "experiments",
                                         "train_soak_r5"))
    ap.add_argument("--out", type=str,
                    default=os.path.join(REPO, "docs", "train_soak_r5.svg"))
    args = ap.parse_args()

    a = rows_of(os.path.join(args.soak, "phaseA.log"))
    b = rows_of(os.path.join(args.soak, "phaseB.log"))
    assert a and b, "need phaseA.log and phaseB.log with step lines"
    resume_step = b[0]["step"]
    rows = a + b
    steps = [r["step"] for r in rows]
    loss = [r["loss"] for r in rows]
    d = [r["d"] for r in rows]

    import matplotlib

    matplotlib.use("svg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(
        2, 1, sharex=True, figsize=(7.2, 4.6),
        gridspec_kw={"hspace": 0.18},
    )
    fig.patch.set_facecolor(SURFACE)
    for ax, ys, color, title in (
        (ax1, loss, SERIES_LOSS, "training loss (MSE, Min-SNR-γ5)"),
        (ax2, d, SERIES_D, "Prodigy d (adaptive lr estimate)"),
    ):
        ax.set_facecolor(SURFACE)
        ax.plot(steps, ys, color=color, linewidth=1.6)
        ax.set_title(title, loc="left", fontsize=10, color=TEXT)
        ax.grid(True, color=GRID, linewidth=0.6)
        ax.tick_params(colors=TEXT_2, labelsize=8)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        # the mid-run interruption: SIGTERM after checkpoint, resume latest
        ax.axvline(resume_step - 0.5, color=TEXT_2, linewidth=0.9,
                   linestyle=(0, (4, 3)))
    ax2.set_yscale("log")
    ax1.annotate(
        "SIGTERM → resume latest", xy=(resume_step - 0.5, max(loss)),
        xytext=(4, -2), textcoords="offset points", fontsize=8,
        color=TEXT_2, va="top",
    )
    ax2.set_xlabel(
        "optimizer step (bs2 × ga32 = 64 samples/step, 512 px)",
        fontsize=9, color=TEXT_2,
    )
    fig.suptitle(
        "EdgeStyle-TPU training soak — reference recipe shape, v5e-1",
        x=0.02, ha="left", fontsize=11, color=TEXT, y=0.99,
    )
    fig.savefig(args.out, bbox_inches="tight", facecolor=SURFACE)
    print(f"wrote {args.out} ({len(rows)} steps, resume at {resume_step})")


if __name__ == "__main__":
    main()
