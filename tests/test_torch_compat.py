"""Checkpoint interop + numerical parity with the shipped reference weights.

The oracle below executes the reference generator graph (documented in
SURVEY.md §2.1 / reference model.py:72-117) with pure torch functional ops
driven directly by the checkpoint tensors — an independent reimplementation
of the spec, used to assert that our Flax generator with converted weights is
numerically equivalent to the PyTorch computation within fp32 tolerance.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fast_srgan_tpu.checkpoints.torch_compat import (
    generator_params_from_torch_state_dict,
    generator_params_to_torch_state_dict,
    load_reference_generator_params,
    load_torch_state_dict,
    read_torch_pickle,
)
from fast_srgan_tpu.models import Generator

REFERENCE_CKPT = "/root/reference/models/model.pt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REFERENCE_CKPT), reason="reference checkpoint not mounted"
)


def torch_generator_forward(sd: dict, x: torch.Tensor, n_layers: int = 8) -> torch.Tensor:
    """Reference-graph oracle: NCHW forward from raw state_dict tensors."""
    def conv(t, key, bias=True, pad=1):
        w = torch.from_numpy(sd[f"{key}.weight"])
        b = torch.from_numpy(sd[f"{key}.bias"]) if bias else None
        return F.conv2d(t, w, b, padding=pad)

    def prelu(t, key):
        return F.prelu(t, torch.from_numpy(sd[key]))

    r = prelu(conv(x, "neck.0"), "neck.1.weight")
    y = r
    for i in range(n_layers):
        t = prelu(
            F.instance_norm(conv(y, f"stem.{i}.conv1", bias=False)),
            f"stem.{i}.relu1.weight",
        )
        y = F.instance_norm(conv(t, f"stem.{i}.conv2", bias=False)) + y
    y = F.instance_norm(conv(y, "bottleneck.0", bias=False)) + r
    for j in range(2):
        y = prelu(
            F.pixel_shuffle(conv(y, f"upsampling.{j}.conv"), 2),
            f"upsampling.{j}.relu.weight",
        )
    return torch.tanh(conv(y, "head.0"))


@pytest.fixture(scope="module")
def reference_sd():
    sd = load_torch_state_dict(REFERENCE_CKPT)
    return {k.replace("_orig_mod.", ""): v for k, v in sd.items()}


class TestRawReader:
    def test_matches_torch_load(self):
        raw = read_torch_pickle(REFERENCE_CKPT)
        via_torch = load_torch_state_dict(REFERENCE_CKPT)
        assert set(raw) == set(via_torch)
        for k in raw:
            np.testing.assert_array_equal(raw[k], via_torch[k])


class TestConversion:
    def test_key_roundtrip(self, reference_sd):
        params = generator_params_from_torch_state_dict(reference_sd)
        back = generator_params_to_torch_state_dict(params)
        assert set(back) == set(reference_sd)
        for k in reference_sd:
            np.testing.assert_array_equal(back[k], reference_sd[k])

    def test_truncated_state_dict_descriptive_error(self, reference_sd):
        sd = {k: v for k, v in reference_sd.items() if not k.startswith("upsampling.")}
        with pytest.raises(ValueError, match="upsampling"):
            generator_params_from_torch_state_dict(sd)

    def test_param_tree_loads_into_model(self, reference_sd):
        params = generator_params_from_torch_state_dict(reference_sd)
        model = Generator(n_filters=64, n_layers=8)
        y = model.apply(params, jnp.zeros((1, 16, 16, 3)))
        assert y.shape == (1, 64, 64, 3)


class TestNumericalParity:
    """Generator outputs fp32-comparable to the PyTorch graph (BASELINE.md)."""

    @pytest.mark.parametrize("shape", [(1, 24, 24), (2, 17, 31)])
    def test_pretrained_forward_matches_torch(self, reference_sd, shape, rng):
        b, h, w = shape
        x = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)

        params = load_reference_generator_params(REFERENCE_CKPT)
        ours = np.asarray(Generator().apply(params, jnp.asarray(x)))

        x_t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())
        with torch.no_grad():
            theirs = torch_generator_forward(reference_sd, x_t)
        theirs = theirs.numpy().transpose(0, 2, 3, 1)

        np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


class TestReaderRobustness:
    def test_non_torch_zip_clear_error(self, tmp_path):
        import zipfile

        path = str(tmp_path / "not_torch.pt")
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("something.txt", "hello")
        with pytest.raises(ValueError, match="not a torch zip"):
            read_torch_pickle(path)

    def test_bf16_checkpoint_loads_via_torch_path(self, tmp_path):
        # tensor.numpy() raises for bf16; the loader must widen to fp32
        # (matching the torch-free reader's bf16 decode).
        w = torch.randn(4, 3).bfloat16()
        path = str(tmp_path / "bf16.pt")
        torch.save({"w": w}, path)
        sd = load_torch_state_dict(path)
        np.testing.assert_allclose(sd["w"], w.float().numpy())
        raw = read_torch_pickle(path)
        np.testing.assert_allclose(raw["w"], sd["w"])
