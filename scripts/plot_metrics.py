#!/usr/bin/env python
"""Render a run's metrics.jsonl to a PNG of training curves.

The JSONL metric log is the TensorBoard-independent record every run writes
(fast_srgan_tpu/utils/logging.py). This renders it for quick inspection —
loss curves per tag on log-scaled axes, PSNR/SSIM on linear — without
needing a TensorBoard server:

    python scripts/plot_metrics.py runs/soak [--out runs/soak/curves.png]

Vertical dashed lines mark resume boundaries (wall-clock gaps > 60 s
between consecutive points), making kill/resume continuity visible.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    path = os.path.join(args.run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        raise SystemExit(f"no metrics.jsonl under {args.run_dir}")
    by_tag: dict = {}
    times = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            m = json.loads(line)
            by_tag.setdefault(m["tag"], []).append((m["step"], m["value"]))
            times.append(m.get("time", 0.0))
    if not by_tag:
        raise SystemExit(f"{path} is empty")

    # resume boundaries: wall-clock gaps between consecutive log writes
    boundaries = []
    for a, b in zip(times, times[1:]):
        if b - a > 60:
            boundaries.append(b)
    boundary_steps = set()
    if boundaries:
        # map each boundary time to the first step logged after it
        with open(path) as f:
            for line in f:
                m = json.loads(line)
                if boundaries and m.get("time", 0.0) >= boundaries[0]:
                    boundary_steps.add(m["step"])
                    boundaries.pop(0)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    loss_tags = sorted(t for t in by_tag if "Loss" in t)
    metric_tags = sorted(t for t in by_tag if "Loss" not in t)
    n_rows = (1 if loss_tags else 0) + (1 if metric_tags else 0)
    fig, axes = plt.subplots(
        n_rows, 1, figsize=(10, 4 * n_rows), squeeze=False
    )
    row = 0
    if loss_tags:
        ax = axes[row][0]
        for tag in loss_tags:
            pts = sorted(by_tag[tag])
            ax.plot([s for s, _ in pts], [v for _, v in pts],
                    label=tag, linewidth=1)
        ax.set_yscale("log")
        ax.set_ylabel("loss")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
        row += 1
    if metric_tags:
        ax = axes[row][0]
        for tag in metric_tags:
            pts = sorted(by_tag[tag])
            ax.plot([s for s, _ in pts], [v for _, v in pts],
                    label=tag, linewidth=1, marker="o", markersize=2)
        ax.set_ylabel("PSNR (dB) / SSIM")
        ax.set_xlabel("step")
        ax.legend(fontsize=7)
        ax.grid(alpha=0.3)
    for axrow in axes:
        for s in boundary_steps:
            axrow[0].axvline(s, linestyle="--", color="gray", alpha=0.6)

    out = args.out or os.path.join(args.run_dir, "curves.png")
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"wrote {out} ({len(by_tag)} tags, "
          f"{sum(len(v) for v in by_tag.values())} points, "
          f"{len(boundary_steps)} resume boundaries)")


if __name__ == "__main__":
    main()
