"""Multi-process `jax.distributed` smoke (scripts/multihost_smoke.py).

Executes the real multi-host code paths — `jax.distributed.initialize`
bring-up, `shard_batch`'s `process_count > 1` branch
(fast_srgan_tpu/parallel/mesh.py), per-host file sharding
(data/pipeline.py `CropSampler(shard=...)`) — in two actual OS processes on
localhost CPU, and asserts per-step loss equality against a single-process
run over the identical global batch. The reference has no distributed
training at all (SURVEY.md §2.7); this is the rebuild's own capability, so
it gets a real multi-process gate rather than only single-process mesh
tests.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


import pytest


@pytest.mark.parametrize("devices_per_host", [1, 4])
def test_two_process_smoke(devices_per_host):
    # devices_per_host=1: minimal bring-up; =4: the realistic pod shape —
    # a 2x4=8-device global mesh where each process addresses only its
    # local 4-device slice.
    env = dict(os.environ)
    # The parent orchestrator spawns its own clean children; drop the test
    # harness's virtual-device flag so the script controls each child's
    # device count itself.
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py"),
         "--devices-per-host", str(devices_per_host)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "MULTIHOST SMOKE OK" in proc.stdout, proc.stdout
