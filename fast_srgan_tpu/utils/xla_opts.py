"""Tuned PJRT compiler options for the SR forward's hot programs.

A measured XLA compiler-option sweep over the 720p headline bench
(scripts/xla_flag_sweep.py; full table in docs/DESIGN.md) found one knob
that moves the fused conv pipeline: raising the scoped-VMEM budget —
the on-chip memory fusions may claim — from the 16 MiB default to 48 MiB
lifts sustained throughput 432.6 -> 464.7 FPS (+7.4%) on v5e, stable to
<0.1% across repeats. Scheduling knobs (latency-hiding scheduler on/off)
measured neutral.

Delivery channel: PJRT ``compiler_options`` on ``jax.jit``. This is the
only channel that reaches a *remote* TPU compiler (e.g. this repo's
development tunnel): client-side XLA_FLAGS are parsed by the local jaxlib
— which fatally rejects TPU-only flag names when it is a CPU build — and
never travel with the compile RPC. Options ARE validated by the serving
compiler (a bogus name fails compilation loudly), so a program that
compiled under these options provably honored them.

Override / kill-switch: set ``FASTSR_COMPILER_OPTIONS`` to a JSON object
to replace the tuned set, or to ``null`` to disable entirely.
"""

from __future__ import annotations

import json
import os

# v5e-measured optimum (scripts/xla_flag_sweep.py, 2026-08; DESIGN.md has
# the 16M..64M landscape). Values are strings: PJRT parses flag-style text.
_TUNED_TPU = {"xla_tpu_scoped_vmem_limit_kib": "49152"}


def env_json_options(name: str) -> tuple[bool, dict | None]:
    """Parse a JSON compiler-options env knob: ``(present, value)``.

    One contract for every FASTSR_*_COMPILER_OPTIONS variable: unset or
    blank means "not set" (fall through to the caller's default — blank
    is how shells 'unset' in one-liners, it must not be a parse error);
    ``null`` means explicitly none; otherwise a JSON object.
    """
    raw = os.environ.get(name)
    if raw is None or not raw.strip():
        return False, None
    return True, json.loads(raw)


def tuned_compiler_options(backend: str | None = None) -> dict | None:
    """Compiler options for the SR forward on the current backend.

    Returns the env override when ``FASTSR_COMPILER_OPTIONS`` is set
    (JSON object, or ``null`` for none); otherwise the measured TPU
    tuning on TPU backends and None elsewhere (the option names are
    TPU-only — a CPU/GPU PJRT compiler would reject them).
    """
    present, value = env_json_options("FASTSR_COMPILER_OPTIONS")
    if present:
        return value
    if backend is None:
        import jax

        backend = jax.default_backend()
    return dict(_TUNED_TPU) if backend == "tpu" else None
