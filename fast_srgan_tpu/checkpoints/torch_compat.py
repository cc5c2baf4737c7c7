"""Bidirectional PyTorch <-> Flax weight conversion.

The compatibility contract is the exact key set of the shipped reference
checkpoint (`/root/reference/models/model.pt`, archive root
``generator_epoch_555000``, 36 tensors, keys ``_orig_mod.``-prefixed because it
was saved from a ``torch.compile``d model — reference inference.py:29-33 strips
the prefix on load; SURVEY.md §2.5 lists the post-strip key map):

    neck.0.{weight,bias}        conv 3->F          -> neck_conv.{kernel,bias}
    neck.1.weight               PReLU slope        -> neck_relu.alpha
    stem.{i}.conv1.weight                           -> stem_{i}.conv1.kernel
    stem.{i}.relu1.weight                           -> stem_{i}.relu1.alpha
    stem.{i}.conv2.weight                           -> stem_{i}.conv2.kernel
    bottleneck.0.weight                             -> bottleneck_conv.kernel
    upsampling.{j}.conv.{weight,bias}               -> upsampling_{j}.conv.{kernel,bias}
    upsampling.{j}.relu.weight                      -> upsampling_{j}.relu.alpha
    head.0.{weight,bias}                            -> head_conv.{kernel,bias}

Layout conversion: torch convs are OIHW, Flax convs are HWIO — transpose
(2, 3, 1, 0). No PixelShuffle channel permutation is needed: our
:func:`~fast_srgan_tpu.ops.pixel_shuffle.pixel_shuffle_nhwc` uses the exact
torch channel ordering (c*r*r + i*r + j), so the conv output-channel index is
preserved through the OIHW->HWIO transpose (the classic cross-framework trap,
neutralized by construction).

Loading the .pt file: ``torch.load(weights_only=True)`` when torch is
available (it is in this image), with a pure zip+pickle fallback reader for
torch-free deployments.
"""

from __future__ import annotations

import io
import pickle
import zipfile
from typing import Any, Dict, Mapping

import numpy as np

from fast_srgan_tpu.models.vgg import VGG19_FEATURES_34_PLAN

# ---------------------------------------------------------------------------
# Raw .pt reading (no torch required)
# ---------------------------------------------------------------------------

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
    "BFloat16Storage": None,  # handled specially
}


class _AttrDict(dict):
    """dict accepting attribute state (stand-in for OrderedDict in pickles)."""


class _TorchUnpickler(pickle.Unpickler):
    """Unpickles a torch checkpoint into numpy arrays without torch."""

    def __init__(self, file, zf: zipfile.ZipFile, prefix: str):
        super().__init__(file)
        self._zf = zf
        self._prefix = prefix

    def find_class(self, module, name):
        if module == "torch._utils" and name in (
            "_rebuild_tensor_v2",
            "_rebuild_tensor",
        ):
            return self._rebuild_tensor
        if module == "torch" and name.endswith("Storage"):
            return name  # marker consumed by persistent_load
        if module == "collections" and name == "OrderedDict":
            # A dict subclass: torch state_dicts carry a `_metadata` attribute
            # that pickle BUILD assigns via __dict__, which plain dict lacks.
            return _AttrDict
        raise pickle.UnpicklingError(f"blocked class {module}.{name}")

    def persistent_load(self, pid):
        # pid = ('storage', StorageType, key, location, numel)
        _, storage_type, key, _location, _numel = pid
        return (storage_type, key)

    def _rebuild_tensor(self, storage, storage_offset, size, stride, *args):
        storage_type, key = storage
        if storage_type not in _DTYPES:
            # np.frombuffer(dtype=None) would silently reinterpret the raw
            # bytes as float64 (8x wrong itemsize) — fail loudly instead.
            raise ValueError(
                f"unsupported torch storage type {storage_type!r}"
            )
        np_dtype = _DTYPES[storage_type]
        raw = self._zf.read(f"{self._prefix}/data/{key}")
        if storage_type == "BFloat16Storage":
            u16 = np.frombuffer(raw, dtype=np.uint16)
            arr32 = (u16.astype(np.uint32) << 16).view(np.float32)
            flat = arr32
        else:
            flat = np.frombuffer(raw, dtype=np_dtype)
        if size:
            # as_strided view honoring arbitrary strides, then densify
            arr = np.lib.stride_tricks.as_strided(
                flat[storage_offset:],
                shape=size,
                strides=[s * flat.itemsize for s in stride],
            ).copy()
        else:
            arr = flat[storage_offset : storage_offset + 1].copy().reshape(())
        return arr


def read_torch_pickle(path: str) -> Dict[str, np.ndarray]:
    """Read a torch zip checkpoint into {key: np.ndarray} without torch."""
    with zipfile.ZipFile(path) as zf:
        pkl_name = next(
            (n for n in zf.namelist() if n.endswith("/data.pkl")), None
        )
        if pkl_name is None:
            raise ValueError(
                f"{path!r} is not a torch zip checkpoint (no */data.pkl "
                "entry; legacy non-zip .pt files are not supported by the "
                "torch-free reader)"
            )
        prefix = pkl_name[: -len("/data.pkl")]
        with zf.open(pkl_name) as f:
            data = _TorchUnpickler(io.BytesIO(f.read()), zf, prefix).load()
    return data


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint as numpy, via torch if present, else raw."""
    try:
        import torch  # noqa: PLC0415

        sd = torch.load(path, map_location="cpu", weights_only=True)
        # tensor.numpy() raises for bf16 (numpy has no bfloat16): widen to
        # fp32 first — same values the raw reader's bf16 path produces.
        return {
            k: (
                v.float().numpy()
                if v.dtype == torch.bfloat16 else v.numpy()
            )
            for k, v in sd.items()
        }
    except ImportError:
        return read_torch_pickle(path)


# ---------------------------------------------------------------------------
# Generator conversion
# ---------------------------------------------------------------------------

def _strip_compile_prefix(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove torch.compile's `_orig_mod.` prefix (reference inference.py:31-32)."""
    return {k.replace("_orig_mod.", ""): v for k, v in sd.items()}


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _hwio_to_oihw(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))


def generator_params_from_torch_state_dict(
    sd: Mapping[str, np.ndarray], n_layers: int | None = None
) -> Dict[str, Any]:
    """Map a reference generator state_dict to our Flax param pytree."""
    sd = _strip_compile_prefix(sd)
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    if n_layers is None:
        n_layers = 1 + max(
            int(k.split(".")[1]) for k in sd if k.startswith("stem.")
        )
    p: Dict[str, Any] = {
        "neck_conv": {
            "kernel": _oihw_to_hwio(sd["neck.0.weight"]),
            "bias": sd["neck.0.bias"],
        },
        "neck_relu": {"alpha": sd["neck.1.weight"]},
        "bottleneck_conv": {"kernel": _oihw_to_hwio(sd["bottleneck.0.weight"])},
        "head_conv": {
            "kernel": _oihw_to_hwio(sd["head.0.weight"]),
            "bias": sd["head.0.bias"],
        },
    }
    for i in range(n_layers):
        p[f"stem_{i}"] = {
            "conv1": {"kernel": _oihw_to_hwio(sd[f"stem.{i}.conv1.weight"])},
            "relu1": {"alpha": sd[f"stem.{i}.relu1.weight"]},
            "conv2": {"kernel": _oihw_to_hwio(sd[f"stem.{i}.conv2.weight"])},
        }
    # stage count from the keys: the reference ships 2 (fixed 4x,
    # model.py:97-100); 2x/8x generators trained here export 1 or 3.
    up_stages = [
        int(k.split(".")[1]) for k in sd if k.startswith("upsampling.")
    ]
    if not up_stages:
        raise ValueError(
            "state_dict has no 'upsampling.*' keys — not a generator "
            "checkpoint (wrong file, or truncated); got keys like "
            f"{sorted(sd)[:5]}"
        )
    n_up = 1 + max(up_stages)
    for j in range(n_up):
        p[f"upsampling_{j}"] = {
            "conv": {
                "kernel": _oihw_to_hwio(sd[f"upsampling.{j}.conv.weight"]),
                "bias": sd[f"upsampling.{j}.conv.bias"],
            },
            "relu": {"alpha": sd[f"upsampling.{j}.relu.weight"]},
        }
    return {"params": p}


def generator_params_to_torch_state_dict(params: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse map: Flax params -> reference-keyed state_dict (numpy OIHW)."""
    p = params["params"] if "params" in params else params
    p = {k: np.asarray(v) if not isinstance(v, Mapping) else v for k, v in p.items()}
    sd: Dict[str, np.ndarray] = {
        "neck.0.weight": _hwio_to_oihw(np.asarray(p["neck_conv"]["kernel"])),
        "neck.0.bias": np.asarray(p["neck_conv"]["bias"]),
        "neck.1.weight": np.asarray(p["neck_relu"]["alpha"]),
        "bottleneck.0.weight": _hwio_to_oihw(np.asarray(p["bottleneck_conv"]["kernel"])),
        "head.0.weight": _hwio_to_oihw(np.asarray(p["head_conv"]["kernel"])),
        "head.0.bias": np.asarray(p["head_conv"]["bias"]),
    }
    n_layers = len([k for k in p if k.startswith("stem_")])
    for i in range(n_layers):
        blk = p[f"stem_{i}"]
        sd[f"stem.{i}.conv1.weight"] = _hwio_to_oihw(np.asarray(blk["conv1"]["kernel"]))
        sd[f"stem.{i}.relu1.weight"] = np.asarray(blk["relu1"]["alpha"])
        sd[f"stem.{i}.conv2.weight"] = _hwio_to_oihw(np.asarray(blk["conv2"]["kernel"]))
    n_up = len([k for k in p if str(k).startswith("upsampling_")])
    for j in range(n_up):
        blk = p[f"upsampling_{j}"]
        sd[f"upsampling.{j}.conv.weight"] = _hwio_to_oihw(np.asarray(blk["conv"]["kernel"]))
        sd[f"upsampling.{j}.conv.bias"] = np.asarray(blk["conv"]["bias"])
        sd[f"upsampling.{j}.relu.weight"] = np.asarray(blk["relu"]["alpha"])
    return sd


def load_reference_generator_params(path: str) -> Dict[str, Any]:
    """Load a reference-format .pt generator checkpoint as Flax params."""
    return generator_params_from_torch_state_dict(load_torch_state_dict(path))


# ---------------------------------------------------------------------------
# Discriminator conversion
# ---------------------------------------------------------------------------
# Reference key schema (model.py:139-193): neck.0.{weight,bias};
# stem.{0..6}.conv.weight (SimpleBlocks, bias-free); stem.7.{weight,bias}
# (the final 1x1 conv appended raw to the Sequential).

def discriminator_params_from_torch_state_dict(
    sd: Mapping[str, np.ndarray]
) -> Dict[str, Any]:
    sd = _strip_compile_prefix(sd)
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    p: Dict[str, Any] = {
        "neck_conv": {
            "kernel": _oihw_to_hwio(sd["neck.0.weight"]),
            "bias": sd["neck.0.bias"],
        },
        "head_conv": {
            "kernel": _oihw_to_hwio(sd["stem.7.weight"]),
            "bias": sd["stem.7.bias"],
        },
    }
    for i in range(7):
        p[f"stem_{i}"] = {
            "conv": {"kernel": _oihw_to_hwio(sd[f"stem.{i}.conv.weight"])}
        }
    return {"params": p}


def discriminator_params_to_torch_state_dict(
    params: Mapping[str, Any]
) -> Dict[str, np.ndarray]:
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {
        "neck.0.weight": _hwio_to_oihw(np.asarray(p["neck_conv"]["kernel"])),
        "neck.0.bias": np.asarray(p["neck_conv"]["bias"]),
        "stem.7.weight": _hwio_to_oihw(np.asarray(p["head_conv"]["kernel"])),
        "stem.7.bias": np.asarray(p["head_conv"]["bias"]),
    }
    for i in range(7):
        sd[f"stem.{i}.conv.weight"] = _hwio_to_oihw(
            np.asarray(p[f"stem_{i}"]["conv"]["kernel"])
        )
    return sd


# ---------------------------------------------------------------------------
# VGG19 conversion (torchvision `vgg19` state_dict -> VGG19Features params)
# ---------------------------------------------------------------------------

def vgg19_params_from_torch_state_dict(
    sd: Mapping[str, np.ndarray]
) -> Dict[str, Any]:
    """Map torchvision ``vgg19`` weights (`features.{idx}.weight/bias`) to ours.

    Accepts either a full torchvision vgg19 state_dict (with classifier keys,
    ignored) or just the features. torchvision conv indices for cfg 'E':
    0,2,5,7,10,12,14,16,19,21,23,25,28,30,32 — the 15 convs kept by
    features[:34] (reference model.py:8).
    """
    torch_conv_indices = []
    idx = 0
    for item in VGG19_FEATURES_34_PLAN:
        if item == "M":
            idx += 1  # pool occupies one slot
        else:
            torch_conv_indices.append(idx)
            idx += 2  # conv + relu
    missing = [
        f"features.{t_i}.{part}"
        for t_i in torch_conv_indices
        for part in ("weight", "bias")
        if f"features.{t_i}.{part}" not in sd
    ]
    if missing:
        raise ValueError(
            "not a torchvision vgg19 state_dict: missing "
            f"{len(missing)} expected keys (first: {missing[:4]}); got keys "
            f"like {sorted(sd)[:4]}. Expected the ImageNet checkpoint "
            "vgg19-dcbb9e9d.pth (torchvision cfg 'E' features)."
        )
    # Shape self-check against cfg 'E' channel widths so a vgg16/vgg19_bn/
    # truncated file errors here, before a training run starts.
    widths = [c for c in VGG19_FEATURES_34_PLAN if c != "M"]
    in_ch = 3
    p: Dict[str, Any] = {}
    for our_i, t_i in enumerate(torch_conv_indices):
        w = np.asarray(sd[f"features.{t_i}.weight"], dtype=np.float32)
        b = np.asarray(sd[f"features.{t_i}.bias"], dtype=np.float32)
        want_w = (widths[our_i], in_ch, 3, 3)
        if w.shape != want_w or b.shape != (widths[our_i],):
            raise ValueError(
                f"features.{t_i}: expected conv weight {want_w} / bias "
                f"({widths[our_i]},) for vgg19 cfg 'E', got {w.shape} / "
                f"{b.shape} — wrong VGG variant or corrupted checkpoint"
            )
        in_ch = widths[our_i]
        p[f"conv_{our_i}"] = {"kernel": _oihw_to_hwio(w), "bias": b}
    return {"params": p}


# ---------------------------------------------------------------------------
# Optimizer-state conversion (optax AdamW <-> torch AdamW state_dict)
# ---------------------------------------------------------------------------
# The reference checkpoints optimizer state as raw torch AdamW state_dicts
# (trainer.py:149-156: generator_optim_epoch_{step}.pt /
# discriminator_optim_epoch_{step}.pt). These converters make full training
# state exchangeable in both directions: torch AdamW keys its state by the
# index of each parameter in model.parameters() order, which for the
# reference modules is registration order. mu/nu mirror the param pytree, so
# the existing weight converters (incl. the OIHW<->HWIO transpose) map them.

GENERATOR_TORCH_PARAM_ORDER_HEAD = ["neck.0.weight", "neck.0.bias", "neck.1.weight"]


def generator_torch_param_order(n_layers: int, n_up: int = 2) -> list:
    order = list(GENERATOR_TORCH_PARAM_ORDER_HEAD)
    for i in range(n_layers):
        order += [
            f"stem.{i}.conv1.weight",
            f"stem.{i}.relu1.weight",
            f"stem.{i}.conv2.weight",
        ]
    order.append("bottleneck.0.weight")
    for j in range(n_up):
        order += [
            f"upsampling.{j}.conv.weight",
            f"upsampling.{j}.conv.bias",
            f"upsampling.{j}.relu.weight",
        ]
    order += ["head.0.weight", "head.0.bias"]
    return order


def discriminator_torch_param_order() -> list:
    order = ["neck.0.weight", "neck.0.bias"]
    order += [f"stem.{i}.conv.weight" for i in range(7)]
    order += ["stem.7.weight", "stem.7.bias"]
    return order


def _adam_state(opt_state):
    """Find the ScaleByAdamState in an optax.adamw chain state.

    Recursive: wrapping transforms (training.grad_clip's
    clip_by_global_norm, schedule states) nest the adamw chain's state
    tuple one level down."""
    for part in opt_state:
        if hasattr(part, "mu") and hasattr(part, "nu"):
            return part
        if isinstance(part, tuple) and not hasattr(part, "_fields"):
            try:
                return _adam_state(part)
            except ValueError:
                pass
    raise ValueError("opt_state does not contain a ScaleByAdamState")


def _replace_state_part(opt_state, old, new):
    """Rebuild a (possibly nested) chain state with ``old`` swapped for
    ``new``; leaves every other part untouched."""
    if opt_state is old:
        return new
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_replace_state_part(p, old, new) for p in opt_state)
    return opt_state


def _sync_counts(opt_state, count):
    """Set every pure step counter in the chain (e.g. ScaleByScheduleState
    from training.lr_schedule) to ``count``.

    Torch AdamW keeps ONE step counter (per-param "step"); optax keeps one
    per stateful transform. A torch warm-start that only restored the
    ScaleByAdamState count would leave a schedule's own counter at 0 — the
    decay would silently restart from the beginning while logs/exports
    (which read the adam count) report the decayed value."""
    import jax.numpy as jnp

    if (
        hasattr(opt_state, "_fields")
        and "count" in opt_state._fields
        and not hasattr(opt_state, "mu")
    ):
        return opt_state._replace(
            count=jnp.asarray(count, opt_state.count.dtype)
        )
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(_sync_counts(p, count) for p in opt_state)
    return opt_state


def _optimizer_to_torch(opt_state, params_to_sd, order, lr):
    adam = _adam_state(opt_state)
    count = float(adam.count)
    mu_sd = params_to_sd(adam.mu)
    nu_sd = params_to_sd(adam.nu)
    state = {
        i: {
            "step": np.float32(count),
            "exp_avg": mu_sd[k],
            "exp_avg_sq": nu_sd[k],
        }
        for i, k in enumerate(order)
    }
    param_groups = [{
        "lr": lr, "betas": (0.9, 0.999), "eps": 1e-8, "weight_decay": 0.01,
        "amsgrad": False, "maximize": False, "foreach": None,
        # fused=None, NOT the reference's fused=True
        # (/root/reference/trainer.py:33-37): torch's load_state_dict adopts
        # the checkpoint's param_groups, so exporting True would force the
        # fused kernel on whatever box resumes this file — raising where it
        # is unsupported (MPS, older CPU backends). fused is an
        # implementation choice with identical step math; None (the
        # constructor default) lets torch pick per-device, and a reference
        # trainer resuming this checkpoint merely falls back to the
        # foreach/single-tensor path instead of crashing.
        "capturable": False, "differentiable": False, "fused": None,
        "params": list(range(len(order))),
    }]
    return {"state": state, "param_groups": param_groups}


def _optimizer_from_torch(sd, sd_to_params, order, like_opt_state):
    import jax
    import jax.numpy as jnp

    state = sd["state"]
    if not state:
        raise ValueError(
            "optimizer state_dict has no per-parameter state (torch AdamW "
            "initializes lazily — this checkpoint was saved before any "
            "optimizer.step()); warm-start the weights only"
        )
    # keys may be int or str depending on serialization
    get = lambda i: state[i] if i in state else state[str(i)]
    mu_sd = {k: np.asarray(get(i)["exp_avg"], np.float32) for i, k in enumerate(order)}
    nu_sd = {k: np.asarray(get(i)["exp_avg_sq"], np.float32) for i, k in enumerate(order)}
    count = int(float(np.asarray(get(0)["step"])))
    mu = sd_to_params(mu_sd)
    nu = sd_to_params(nu_sd)
    adam = _adam_state(like_opt_state)
    new_adam = adam._replace(
        count=jnp.asarray(count, jnp.int32),
        mu=jax.tree.map(lambda a, b: jnp.asarray(b, a.dtype), adam.mu, mu),
        nu=jax.tree.map(lambda a, b: jnp.asarray(b, a.dtype), adam.nu, nu),
    )
    return _sync_counts(
        _replace_state_part(like_opt_state, adam, new_adam), count
    )


def generator_optimizer_to_torch_state_dict(
    opt_state, n_layers: int = 8, lr: float = 1e-4, n_up: int = 2
):
    """optax AdamW state -> torch AdamW state_dict (reference param order)."""
    return _optimizer_to_torch(
        opt_state, generator_params_to_torch_state_dict,
        generator_torch_param_order(n_layers, n_up), lr,
    )


def generator_optimizer_from_torch_state_dict(
    sd, like_opt_state, n_layers: int = 8, n_up: int = 2
):
    """torch AdamW state_dict -> optax AdamW state (structure from `like`)."""
    return _optimizer_from_torch(
        sd,
        lambda s: generator_params_from_torch_state_dict(s, n_layers),
        generator_torch_param_order(n_layers, n_up), like_opt_state,
    )


def discriminator_optimizer_to_torch_state_dict(opt_state, lr: float = 1e-4):
    return _optimizer_to_torch(
        opt_state, discriminator_params_to_torch_state_dict,
        discriminator_torch_param_order(), lr,
    )


def discriminator_optimizer_from_torch_state_dict(sd, like_opt_state):
    return _optimizer_from_torch(
        sd,
        lambda s: discriminator_params_from_torch_state_dict(s),
        discriminator_torch_param_order(), like_opt_state,
    )
