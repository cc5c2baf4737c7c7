"""fetch_vgg.py verify-path behavior (offline: no download is attempted)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "fetch_vgg.py")


def run(*args):
    return subprocess.run(
        [sys.executable, SCRIPT, *args],
        cwd=REPO, capture_output=True, text=True, timeout=120,
    )


def test_missing_file_errors():
    p = run("--verify-only", "--out", "/tmp/definitely_missing_vgg.pth")
    assert p.returncode != 0
    assert "does not exist" in p.stdout + p.stderr


def test_wrong_hash_rejected(tmp_path):
    fake = tmp_path / "vgg19-dcbb9e9d.pth"
    fake.write_bytes(b"not the real weights")
    p = run("--verify-only", "--out", str(fake))
    assert p.returncode != 0
    out = p.stdout + p.stderr
    assert "SHA256 prefix" in out and "dcbb9e9d" in out
