"""Network interpolation / checkpoint averaging (scripts/interp_checkpoints.py)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from interp_checkpoints import blend_param_trees  # noqa: E402

from fast_srgan_tpu.checkpoints.npz_io import (  # noqa: E402
    flatten_tree,
    load_npz_params,
    save_npz_params,
)
from fast_srgan_tpu.models import Generator  # noqa: E402


def tiny_params(seed):
    model = Generator(n_filters=8, n_layers=2)
    return model.init(jax.random.key(seed), jnp.zeros((1, 8, 8, 3)))


class TestBlend:
    def test_endpoints_and_midpoint(self):
        a, b = tiny_params(0), tiny_params(1)
        fa, fb = flatten_tree(a), flatten_tree(b)
        for alpha, ref in ((0.0, fa), (1.0, fb)):
            out = flatten_tree(blend_param_trees([a, b], [1 - alpha, alpha]))
            for k in ref:
                np.testing.assert_allclose(out[k], ref[k], atol=1e-7)
        mid = flatten_tree(blend_param_trees([a, b], [0.5, 0.5]))
        for k in fa:
            np.testing.assert_allclose(
                mid[k], 0.5 * fa[k] + 0.5 * fb[k], atol=1e-6
            )

    def test_weights_normalized(self):
        a, b = tiny_params(0), tiny_params(1)
        w1 = flatten_tree(blend_param_trees([a, b], [2.0, 6.0]))
        w2 = flatten_tree(blend_param_trees([a, b], [0.25, 0.75]))
        for k in w1:
            np.testing.assert_allclose(w1[k], w2[k], atol=1e-6)

    def test_structure_mismatch_rejected(self):
        a = tiny_params(0)
        model_b = Generator(n_filters=8, n_layers=3)
        b = model_b.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        with pytest.raises(ValueError, match="different param tree"):
            blend_param_trees([a, b], [0.5, 0.5])

    def test_shape_mismatch_rejected(self):
        a = tiny_params(0)
        model_b = Generator(n_filters=16, n_layers=2)
        b = model_b.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        with pytest.raises(ValueError, match="shape mismatch|different"):
            blend_param_trees([a, b], [0.5, 0.5])

    def test_bad_weights_rejected(self):
        a, b = tiny_params(0), tiny_params(1)
        with pytest.raises(ValueError, match="sum to > 0"):
            blend_param_trees([a, b], [0.0, 0.0])
        with pytest.raises(ValueError, match="weights"):
            blend_param_trees([a, b], [1.0])


class TestCli:
    def test_alpha_interpolation_end_to_end(self, tmp_path):
        pa, pb = str(tmp_path / "a.npz"), str(tmp_path / "b.npz")
        save_npz_params(pa, tiny_params(0))
        save_npz_params(pb, tiny_params(1))
        out_path = str(tmp_path / "blend.npz")
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/interp_checkpoints.py"),
             "--alpha", "0.8", pa, pb, "-o", out_path],
            capture_output=True, text=True, cwd=REPO, timeout=240,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        got = flatten_tree(load_npz_params(out_path))
        fa = flatten_tree(tiny_params(0))
        fb = flatten_tree(tiny_params(1))
        for k in fa:
            np.testing.assert_allclose(
                got[k], 0.2 * fa[k] + 0.8 * fb[k], atol=1e-6
            )

    def test_arch_mismatch_exits_nonzero(self, tmp_path):
        pa = str(tmp_path / "a.npz")
        pb = str(tmp_path / "b.npz")
        save_npz_params(pa, tiny_params(0))
        model_b = Generator(n_filters=16, n_layers=2)
        save_npz_params(
            pb, model_b.init(jax.random.key(1), jnp.zeros((1, 8, 8, 3)))
        )
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/interp_checkpoints.py"),
             pa, pb, "-o", str(tmp_path / "x.npz")],
            capture_output=True, text=True, cwd=REPO, timeout=240,
        )
        assert r.returncode != 0
        assert "architecture mismatch" in (r.stderr + r.stdout)
