"""VGG19 feature extractor: numerical parity with the torch graph, and the
training.vgg_weights config path end-to-end.

The reference's perceptual loss runs torchvision ``vgg19().features[:34]``
on [-1,1] inputs after ImageNet normalization (reference model.py:5-23).
ImageNet weights are not available in this environment (no egress), so the
oracles use torch-built weights: one case constructs torchvision's literal
vgg19 module layout in plain torch (state_dict keys from torch's OWN module
naming, forward through ``features[:34]`` as the oracle), another a
hand-built synthetic-layout dict — parity of the computation graph and the
weight conversion is what's under test, and it holds for any weights.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fast_srgan_tpu.checkpoints.torch_compat import (
    vgg19_params_from_torch_state_dict,
)
from fast_srgan_tpu.models.vgg import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    VGG19_FEATURES_34_PLAN,
    VGG19Features,
)


_SD_CACHE = {}


def synthetic_torch_vgg_sd(seed=0):
    """Random torchvision-layout `features.{idx}.weight/bias` state_dict.

    Cached per seed and generated directly in float32: the ~20M-param
    tree costs seconds per build on this box and three tests consume it.
    Callers treat it as read-only."""
    if seed in _SD_CACHE:
        return _SD_CACHE[seed]
    rng = np.random.default_rng(seed)
    sd = {}
    idx, c_in = 0, 3
    for item in VGG19_FEATURES_34_PLAN:
        if item == "M":
            idx += 1  # the pool layer occupies an index
            continue
        # conv at `idx`, relu at `idx+1`
        sd[f"features.{idx}.weight"] = rng.standard_normal(
            (item, c_in, 3, 3), dtype=np.float32
        ) * np.float32(np.sqrt(2.0 / (c_in * 9)))
        sd[f"features.{idx}.bias"] = (
            rng.standard_normal(item, dtype=np.float32) * np.float32(0.01)
        )
        idx += 2
        c_in = item
    _SD_CACHE[seed] = sd
    return sd


def torch_vgg_forward(sd, x_nchw: torch.Tensor) -> torch.Tensor:
    """features[:34] oracle on [-1,1] input (reference model.py:17-22)."""
    mean = torch.tensor(IMAGENET_MEAN, dtype=torch.float32).view(1, 3, 1, 1)
    std = torch.tensor(IMAGENET_STD, dtype=torch.float32).view(1, 3, 1, 1)
    x = ((x_nchw.float() + 1.0) / 2.0 - mean) / std
    idx = 0
    for item in VGG19_FEATURES_34_PLAN:
        if item == "M":
            x = F.max_pool2d(x, 2, 2)
            idx += 1
            continue
        x = F.relu(
            F.conv2d(
                x,
                torch.from_numpy(sd[f"features.{idx}.weight"]),
                torch.from_numpy(sd[f"features.{idx}.bias"]),
                padding=1,
            )
        )
        idx += 2
    return x


# torchvision cfg 'E' (vgg19): the FULL features stack, 16 convs + 5 pools
# (torchvision.models.vgg.cfgs["E"]). The reference keeps features[:34]
# (reference model.py:8) — everything through the ReLU after conv5_3.
VGG19_CFG_E_FULL = [
    64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
    512, 512, 512, 512, "M", 512, 512, 512, 512, "M",
]


def make_torchvision_style_vgg19() -> torch.nn.Module:
    """torchvision's literal vgg19 graph built in plain torch: an
    ``nn.Sequential`` registered as ``features`` with conv/relu/pool laid
    out exactly like torchvision's ``make_layers(cfgs["E"])`` — so
    ``state_dict()`` produces the real key map (``features.0.weight`` …
    ``features.34.weight``) by torch's OWN module naming, plus classifier
    keys, matching the on-disk vgg19-dcbb9e9d.pth structure."""
    layers = []
    c_in = 3
    for v in VGG19_CFG_E_FULL:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(torch.nn.Conv2d(c_in, v, kernel_size=3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            c_in = v

    class TorchVisionStyleVGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = torch.nn.Sequential(*layers)
            # the ImageNet checkpoint also carries classifier.* keys; the
            # converter must ignore them
            self.classifier = torch.nn.Linear(512 * 7 * 7, 4096)

    torch.manual_seed(0)
    return TorchVisionStyleVGG()


# one jitted apply shared by the parity cases (same shapes -> the second
# test reuses the compiled executable instead of paying the 15-conv
# compile again)
_VGG = VGG19Features()
_vgg_apply = jax.jit(_VGG.apply)


class TestVGGParity:
    def test_real_torch_layout_state_dict_matches_features34_oracle(self, rng):
        """The converter's last key/layout risk, closed without egress:
        the state_dict comes from torch's own module naming (not a
        hand-built dict), and the oracle is the torch module's
        ``features[:34]`` forward — the exact consumer the reference builds
        at /root/reference/model.py:5-23."""
        model = make_torchvision_style_vgg19().eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        # torch's own naming produced the full real key map
        assert "features.0.weight" in sd and "features.32.weight" in sd
        assert "features.34.weight" in sd  # conv5_4, dropped by [:34]
        assert "classifier.weight" in sd  # ignored by the converter

        params = vgg19_params_from_torch_state_dict(sd)
        x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)

        ours = np.asarray(_vgg_apply(params, jnp.asarray(x)))
        with torch.no_grad():
            mean = torch.tensor(IMAGENET_MEAN).view(1, 3, 1, 1)
            std = torch.tensor(IMAGENET_STD).view(1, 3, 1, 1)
            xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
            normalized = ((xt + 1.0) / 2.0 - mean) / std
            want = (
                model.features[:34](normalized).permute(0, 2, 3, 1).numpy()
            )
        assert ours.shape == want.shape == (1, 2, 2, 512)
        np.testing.assert_allclose(ours, want, atol=2e-4)

    def test_converted_weights_match_torch_graph(self, rng):
        sd = synthetic_torch_vgg_sd()
        params = vgg19_params_from_torch_state_dict(sd)
        x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)

        ours = _vgg_apply(params, jnp.asarray(x))
        want = torch_vgg_forward(
            sd, torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).permute(0, 2, 3, 1).numpy()

        assert ours.shape == want.shape == (1, 2, 2, 512)
        np.testing.assert_allclose(np.asarray(ours), want, atol=2e-4)

    def test_converter_rejects_wrong_variant(self):
        # A vgg16-shaped (or truncated) state_dict must error at conversion,
        # not train silently with wrong features.
        sd = synthetic_torch_vgg_sd()
        truncated = {k: v for k, v in sd.items() if not k.startswith("features.28")}
        with pytest.raises(ValueError, match="missing"):
            vgg19_params_from_torch_state_dict(truncated)
        wrong = dict(sd)
        wrong["features.2.weight"] = sd["features.2.weight"][:32]  # half width
        with pytest.raises(ValueError, match="cfg 'E'"):
            vgg19_params_from_torch_state_dict(wrong)

    def test_gan_phase_without_vgg_weights_fails_loudly(self):
        from fast_srgan_tpu.config import default_config
        from fast_srgan_tpu.train.steps import build_bundle

        config = default_config(
            data={"lr_image_size": 8},
            generator={"n_filters": 8, "n_layers": 1},
            discriminator={"n_filters": 8},
            training={"bf16": False},
        )
        with pytest.raises(ValueError, match="vgg19-dcbb9e9d.pth"):
            build_bundle(config)

    def test_pretrain_only_needs_no_vgg(self):
        # success path split out: building the bundle inits real states
        # (an XLA compile), so this lives in the slow tier while the
        # fail-loud contract above stays in the per-commit gate.
        from fast_srgan_tpu.config import default_config
        from fast_srgan_tpu.train.steps import build_bundle

        config = default_config(
            data={"lr_image_size": 8},
            generator={"n_filters": 8, "n_layers": 1},
            discriminator={"n_filters": 8},
            training={"bf16": False, "iterations": 0},
        )
        build_bundle(config)

    def test_gan_step_uses_vgg_weights_file(self, tmp_path, rng):
        # training.vgg_weights end to end: a .pth file changes the content
        # loss away from the pixel-space fallback and the step stays finite.
        sd = synthetic_torch_vgg_sd()
        path = tmp_path / "vgg19.pth"
        torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(path))

        from fast_srgan_tpu.config import default_config
        from fast_srgan_tpu.train.steps import build_bundle

        kw = dict(
            data={"lr_image_size": 8},
            generator={"n_filters": 8, "n_layers": 1},
            discriminator={"n_filters": 8},
            training={"batch_size": 2, "bf16": False, "vgg_weights": "pixel"},
        )
        cfg_vgg = default_config(**{
            **kw, "training": dict(kw["training"], vgg_weights=str(path)),
        })
        cfg_pix = default_config(**kw)

        batch = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        key = jax.random.key(0)
        losses = {}
        for name, cfg in [("vgg", cfg_vgg), ("pixel", cfg_pix)]:
            bundle, g, d, vgg_params = build_bundle(cfg)
            g, d, metrics = bundle.gan_step(
                g, d, vgg_params, jnp.asarray(batch), key
            )
            for k, v in metrics.items():
                assert np.isfinite(float(v)), (name, k)
            losses[name] = float(metrics["content_loss"])
        # perceptual features change the content term
        assert losses["vgg"] != pytest.approx(losses["pixel"])
