#!/usr/bin/env python
"""Probe the last measured single-chip gap with XLA scheduling/memory knobs.

docs/DESIGN.md's roofline analysis leaves the 720p headline bench at ~81% of
XLA's own cost-model optimum and attributes the residual to imperfect
compute/memory overlap inside the compiled program. Four Pallas campaigns
bounded hand-kernel headroom at a few percent, but no *compiler-option*
sweep was ever recorded for the final program — this script closes that:
each arm re-runs the full bench (bench.py, 800-frame protocol) in a fresh
subprocess with one compiler-option configuration, best-of-N to absorb
tunnel variance, and prints a table plus a JSON summary for DESIGN.md.

Delivery channel: PJRT ``compiler_options`` via ``jax.jit`` (bench.py reads
them from the FASTSR_COMPILER_OPTIONS env var as a JSON object). This is
the ONLY channel that reaches this environment's tunneled server-side TPU
compiler — client-side XLA_FLAGS are parsed by the local CPU jaxlib, which
fatally rejects TPU-only flag names (measured: `--xla_tpu_*` in XLA_FLAGS
aborts the process before any RPC), and recognized ones still never travel
with the compile request. PJRT options ARE validated server-side: a bogus
option name makes compilation fail loudly (verified), so a completed arm
proves its options were honored.

Arms target the two lever families a fused conv pipeline has on TPU:
  * instruction scheduling (latency-hiding scheduler on/off),
  * scoped VMEM budget (xla_tpu_scoped_vmem_limit_kib), which bounds how
    much on-chip memory fusions may claim — the knob that moves
    compute/memory overlap for bandwidth-bound fusion chains.

An option the server-side XLA build does not recognize makes the child
fail; that arm is recorded as "invalid-flag", not silently dropped.

Usage: python scripts/xla_flag_sweep.py  [REPEATS=2] [BENCH_FRAMES=800]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARMS = [
    ("baseline", None),
    ("lhs-on", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("lhs-off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("vmem-32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem-64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    (
        "lhs-on+vmem-64m",
        {
            "xla_tpu_enable_latency_hiding_scheduler": "true",
            "xla_tpu_scoped_vmem_limit_kib": "65536",
        },
    ),
]


def run_arm(options: dict | None, frames: int) -> tuple:
    """One bench.py run under `options`; returns (fps|None, error|None)."""
    env = dict(os.environ)
    env["FASTSR_COMPILER_OPTIONS"] = json.dumps(options)
    env["BENCH_FRAMES"] = str(frames)
    # One probe attempt: the sweep runs attended; a tunnel outage should
    # surface immediately rather than burn 18 min per arm retrying.
    env["BENCH_PROBE_RETRIES"] = "1"
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1200,
    )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-3:]
        return None, " | ".join(tail)
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)["value"], None
    return None, "no JSON line in bench output"


def main() -> None:
    repeats = int(os.environ.get("REPEATS", "2"))
    frames = int(os.environ.get("BENCH_FRAMES", "800"))
    results = []
    for name, options in ARMS:
        best, err = None, None
        for r in range(repeats):
            fps, err = run_arm(options, frames)
            print(
                f"# {name} run {r + 1}/{repeats}: "
                + (f"{fps:.2f} fps" if fps else f"FAILED ({err})"),
                file=sys.stderr, flush=True,
            )
            if fps is not None and (best is None or fps > best):
                best = fps
            if fps is None and err and (
                "Unknown" in err or "INVALID_ARGUMENT" in err
            ):
                err = f"invalid-flag: {err}"
                break
        results.append({"arm": name, "options": options, "best_fps": best,
                        "error": None if best is not None else err})

    # base can be None (e.g. a tunnel outage during the baseline repeats):
    # the completed arms' absolute numbers must still print, ratios become
    # '--' rather than crashing after every arm already ran.
    base = next(r["best_fps"] for r in results if r["arm"] == "baseline")
    print(f"\n{'arm':<18} {'best fps':>9} {'vs baseline':>12}  options")
    for r in results:
        if r["best_fps"] is None:
            print(f"{r['arm']:<18} {'--':>9} {'--':>12}  {r['error']}")
        else:
            vs = f"{r['best_fps'] / base:.3f}x" if base else "--"
            print(
                f"{r['arm']:<18} {r['best_fps']:>9.2f} "
                f"{vs:>12}  {r['options'] or '(none)'}"
            )
    print(json.dumps({"frames": frames, "repeats": repeats,
                      "results": results}))


if __name__ == "__main__":
    main()
