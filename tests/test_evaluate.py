"""End-to-end drive of scripts/evaluate.py (standard SR benchmark protocol).

The reference has no standalone evaluation tool (metrics live inside
trainer.py:53-69 only); evaluate.py is the rebuild's addition, including
the literature's Y-channel + border-shave protocol. These tests drive the
CLI as a subprocess on a tiny checkpoint so the flag surface (including
--y_channel / --shave accounting) stays honest.
"""

import os
import re
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_inputs(tmp_path):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from fast_srgan_tpu.checkpoints.npz_io import save_npz_params
    from fast_srgan_tpu.models import Generator

    model = Generator(n_filters=8, n_layers=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
    ckpt = tmp_path / "tiny.npz"
    save_npz_params(str(ckpt), params)

    img_dir = tmp_path / "hr"
    img_dir.mkdir()
    rng = np.random.default_rng(7)
    for name, (h, w) in [("a.png", (64, 72)), ("b.png", (80, 64))]:
        Image.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8), "RGB"
        ).save(img_dir / name)
    return ckpt, img_dir


def _run(ckpt, img_dir, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "evaluate.py"),
         "--image_dir", str(img_dir), "--checkpoint", str(ckpt),
         "--fp32", *extra],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def _aggregate_psnr(stdout):
    m = re.search(r"aggregate\s+PSNR\s+([-\d.]+|inf) dB", stdout)
    assert m, stdout
    return float(m.group(1))


class TestEvaluateCLI:
    def test_rgb_default(self, tmp_path):
        ckpt, img_dir = _make_inputs(tmp_path)
        out = _run(ckpt, img_dir)
        psnr = _aggregate_psnr(out)
        assert np.isfinite(psnr) and 0 < psnr < 60, out
        assert "(2 images)" in out

    def test_y_channel_shave(self, tmp_path):
        ckpt, img_dir = _make_inputs(tmp_path)
        out = _run(ckpt, img_dir, "--y_channel")
        psnr_y = _aggregate_psnr(out)
        assert np.isfinite(psnr_y) and 0 < psnr_y < 60, out
        # explicit shave override parses and runs
        out8 = _run(ckpt, img_dir, "--y_channel", "--shave", "8")
        assert np.isfinite(_aggregate_psnr(out8))
