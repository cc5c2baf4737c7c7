#!/usr/bin/env python
"""Hardware training soak: thousands of real steps + a mid-GAN kill/resume.

The closest achievable proxy (no DIV2K in this environment) for the
reference's 555k-step two-phase run (reference trainer.py:89-233): a
multi-thousand-step pretrain+GAN training on procedural data, interrupted
with SIGINT mid-GAN-phase and relaunched, asserting that

  * the interrupt snapshot lands ("Interrupted at step N; checkpointing"),
  * the relaunch resumes from that step ("Resuming GAN phase from step N"),
  * the metric curves are continuous across the kill (logged steps strictly
    increase, resume introduces no gap or rewind beyond log cadence),
  * every logged loss/metric is finite over the whole run,
  * fidelity improved end-to-end (final GAN-phase PSNR well above the
    untrained starting point).

Curves land in runs/<name>/metrics.jsonl (+ TensorBoard events); the
orchestrator writes runs/<name>/SOAK_REPORT.json and prints a JSON verdict.

Usage:
    python scripts/soak.py [--pretrain 1500] [--gan 3000] [--name soak]
                           [--kill-frac 0.4] [--data DIR]

Env: plain `python` — runs on whatever device the session sees (the point
is the real TPU chip; it also works on CPU for a slow functional check).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def read_metrics(path: str):
    out = []
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                out.append(json.loads(line))
    return out


def launch(cmd, log_path):
    """Start the trainer with stdout+stderr appended to ``log_path``.

    Output goes to a file, NOT a pipe: nothing drains a pipe while the
    monitor loop watches metrics.jsonl, and a full 64 KB pipe buffer would
    block the child (tqdm alone overflows it long before the kill point on
    realistic step counts).
    """
    f = open(log_path, "a")
    p = subprocess.Popen(cmd, cwd=REPO, stdout=f, stderr=subprocess.STDOUT)
    p._soak_log = f  # closed by wait_and_read
    return p


def wait_and_read(p, log_path, timeout):
    """Wait for the child, close its log handle, return the log text."""
    try:
        p.wait(timeout=timeout)
    finally:
        p._soak_log.close()
    with open(log_path) as f:
        return f.read()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain", type=int, default=1500)
    ap.add_argument("--gan", type=int, default=3000)
    ap.add_argument("--name", default="soak")
    ap.add_argument("--kill-frac", type=float, default=0.4,
                    help="fraction of the GAN phase after which SIGINT fires")
    ap.add_argument("--data", default="/tmp/fastsr_soak_data")
    ap.add_argument("--n-images", type=int, default=96)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-launch wall clock limit, seconds")
    ap.add_argument("--log-iter", type=int, default=25)
    ap.add_argument("--ckpt-iter", type=int, default=250)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--min-gain", type=float, default=3.0,
                    help="required PSNR improvement (dB) start->final")
    ap.add_argument("--extra", action="append", default=[],
                    help="extra key=value train.py overrides, repeatable "
                         "(e.g. --extra training.ema_decay=0.999 to drill "
                         "EMA-state resume)")
    args = ap.parse_args()

    # --- 1. procedural dataset ---
    if not (os.path.isdir(args.data) and os.listdir(args.data)):
        subprocess.run(
            [sys.executable, "scripts/make_dataset.py", args.data,
             "--n", str(args.n_images), "--size", "256"],
            cwd=REPO, check=True,
        )

    run_dir = os.path.join(REPO, "runs", args.name)
    metrics_path = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(metrics_path):
        raise SystemExit(
            f"{metrics_path} already exists — pick a fresh --name or remove "
            "the old run dir (the soak needs a clean metric log to analyze)"
        )
    os.makedirs(run_dir, exist_ok=True)  # launch logs live here

    cmd = [
        sys.executable, "train.py",
        # stay in the repo cwd: the monitor tails runs/<name>/metrics.jsonl
        # (hydra.run.dir=. opts out of the default per-run output dir)
        "hydra.run.dir=.",
        f"data.image_dir={args.data}",
        f"data.numpy_dir={args.data}_np",
        f"experiment.name={args.name}",
        f"training.pretrain_iterations={args.pretrain}",
        f"training.iterations={args.gan}",
        "training.vgg_weights=pixel",
        f"training.log_iter={args.log_iter}",
        f"training.checkpoint_iter={args.ckpt_iter}",
        f"training.batch_size={args.batch}",
    ] + list(args.extra)
    kill_after_step = max(1, int(args.gan * args.kill_frac))

    # --- 2. first launch, SIGINT once the GAN phase passes kill_after_step ---
    print(f"[soak] launch 1: {' '.join(cmd)}")
    print(f"[soak] will SIGINT once a GAN metric at step>={kill_after_step} "
          "is logged")
    log1 = os.path.join(run_dir, "soak_launch1.log")
    p1 = launch(cmd, log1)
    t0 = time.time()
    killed_at = None
    while p1.poll() is None:
        if time.time() - t0 > args.timeout:
            p1.kill()
            raise SystemExit("[soak] launch 1 exceeded timeout")
        gan_steps = [
            m["step"] for m in read_metrics(metrics_path)
            if m["tag"] == "Loss/Generator/Adversarial"
        ]
        if gan_steps and max(gan_steps) >= kill_after_step:
            killed_at = max(gan_steps)
            print(f"[soak] GAN reached step {killed_at}; sending SIGINT")
            p1.send_signal(signal.SIGINT)
            break
        time.sleep(2)
    out1 = wait_and_read(p1, log1, timeout=600)
    if killed_at is None:
        raise SystemExit(
            f"[soak] run finished (rc={p1.returncode}) before the kill "
            f"point — output:\n{out1[-3000:]}"
        )
    if "Interrupted at step" not in out1:
        raise SystemExit(
            f"[soak] no interrupt snapshot message in output:\n{out1[-3000:]}"
        )
    snap_line = [l for l in out1.splitlines() if "Interrupted at step" in l][0]
    snap_step = int("".join(c for c in snap_line.split("step")[1] if c.isdigit()))
    print(f"[soak] launch 1 interrupted; snapshot at GAN step {snap_step}")

    # --- 3. relaunch: must resume and run to completion ---
    print("[soak] launch 2 (resume)")
    log2 = os.path.join(run_dir, "soak_launch2.log")
    p2 = launch(cmd, log2)
    try:
        out2 = wait_and_read(p2, log2, timeout=args.timeout)
    except subprocess.TimeoutExpired:
        p2.kill()
        raise SystemExit("[soak] launch 2 exceeded timeout")
    if p2.returncode != 0:
        raise SystemExit(
            f"[soak] launch 2 failed rc={p2.returncode}:\n{out2[-3000:]}"
        )
    resume_lines = [
        l for l in out2.splitlines() if "Resuming GAN phase from step" in l
    ]
    if not resume_lines:
        raise SystemExit(
            f"[soak] launch 2 did not resume the GAN phase:\n{out2[-3000:]}"
        )
    resume_step = int(
        "".join(c for c in resume_lines[0].split("step")[1] if c.isdigit())
    )
    assert resume_step == snap_step, (resume_step, snap_step)
    # pretrain must NOT have re-run: the finished-pretrain checkpoint short-
    # circuits it
    assert "skipping pretraining" in out2, out2[-3000:]

    # --- 4. curve analysis ---
    metrics = read_metrics(metrics_path)
    by_tag: dict = {}
    for m in metrics:
        by_tag.setdefault(m["tag"], []).append((m["step"], m["value"]))

    problems = []
    for tag, pts in by_tag.items():
        if any(
            not (v == v and abs(v) != float("inf")) for _, v in pts
        ):
            problems.append(f"non-finite value in {tag}")

    # continuity: run-2 GAN entries continue where run 1 stopped
    adv = by_tag.get("Loss/Generator/Adversarial", [])
    all_adv_steps = [s for s, _ in adv]
    if sorted(set(all_adv_steps)) != sorted(all_adv_steps):
        # duplicate steps allowed only at the resume boundary (the snapshot
        # step's window may be re-logged); flag anything else
        dupes = {s for s in all_adv_steps if all_adv_steps.count(s) > 1}
        if not dupes <= {snap_step}:
            problems.append(f"duplicate GAN steps beyond the boundary: {dupes}")
    if max(all_adv_steps) < args.gan:
        problems.append(
            f"GAN phase incomplete: last logged step {max(all_adv_steps)}"
        )
    if snap_step < args.gan:
        # (when SIGINT lands only at the very end of the phase — possible
        # with tiny functional-check step counts — there is nothing after
        # the snapshot to measure a gap against)
        gap = min(
            (s for s in all_adv_steps if s > snap_step), default=10**9
        ) - snap_step
        if gap > args.log_iter:
            problems.append(
                f"resume gap after snapshot: {gap} steps unlogged"
            )

    psnr = sorted(by_tag.get("GAN/PSNR", []))
    pre_psnr = sorted(by_tag.get("Pretrain/PSNR", []))
    start_db = pre_psnr[0][1] if pre_psnr else float("nan")
    final_db = psnr[-1][1] if psnr else float("nan")
    if not (final_db > start_db + args.min_gain):
        problems.append(
            f"no fidelity improvement: start {start_db:.2f} dB -> "
            f"final {final_db:.2f} dB"
        )

    report = {
        "pretrain_iterations": args.pretrain,
        "gan_iterations": args.gan,
        "interrupt_gan_step": snap_step,
        "resume_gan_step": resume_step,
        "pretrain_start_psnr_db": round(start_db, 2),
        "final_gan_psnr_db": round(final_db, 2),
        "final_gan_ssim": round(
            sorted(by_tag.get("GAN/SSIM", [(0, float("nan"))]))[-1][1], 4
        ),
        "n_metric_points": len(metrics),
        "problems": problems,
        "ok": not problems,
    }
    with open(os.path.join(run_dir, "SOAK_REPORT.json"), "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if problems:
        raise SystemExit("[soak] FAILED: " + "; ".join(problems))
    print("SOAK OK")


if __name__ == "__main__":
    main()
