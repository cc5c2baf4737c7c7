"""Serialized deployment artifacts: the SR forward as portable StableHLO.

The reference "deploys" by shipping Python + torch and loading a ``.pt``
state_dict at runtime (reference inference.py:26-35). The TPU-native
deployment unit is different: ``jax.export`` lowers the jitted inference
forward — weights embedded as constants — to a versioned, serialized
StableHLO module that any JAX runtime (TPU server, CPU box; no model
code, no checkpoint plumbing) can deserialize and call. Artifacts are
exported per input shape (XLA compiles static shapes; shape-bucketing
policy stays with the caller, as in the engine) and can carry multiple
lowering platforms at once — export on a CPU dev box, serve on TPU.

Format: a directory with ``manifest.json`` (scale, architecture, entry
table) and one ``.stablehlo`` blob per exported shape.

Drive: ``scripts/export_model.py`` (export + self-check),
``load_exported_dir`` here for serving-side loading.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

MANIFEST = "manifest.json"


def build_forward_u8(
    params: Dict[str, Any],
    *,
    n_filters: int,
    n_layers: int,
    scale_factor: int = 4,
    bf16: bool = True,
    lr_tail: bool = True,
    quantize: bool = False,
    calib_batches: Optional[Sequence[Any]] = None,
):
    """The engine's uint8->uint8 forward (SRInferenceEngine._forward_u8
    semantics: /127.5-1 in, LR-tail generator, uint8 out) with the params
    baked in as closure constants — the self-contained deployable fn.

    quantize: bake the production int8 PTQ tier instead (ups-only policy,
    fast_srgan_tpu/quant.py — the engine's ``quantize=True``): the int8
    kernels, dequant scales, AND calibrated activation scales all become
    artifact constants, so the deployment unit needs no calibration at
    load time. ``calib_batches`` (sample inputs, as the engine takes)
    sets the activation scales; default: one synthetic batch."""
    import jax
    import jax.numpy as jnp

    from fast_srgan_tpu.models import Generator

    model = Generator(
        n_filters=n_filters,
        n_layers=n_layers,
        scale_factor=scale_factor,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    if quantize:
        from fast_srgan_tpu import quant

        glue = jnp.bfloat16 if bf16 else jnp.float32
        if calib_batches is None:
            calib_batches = [quant.default_calibration_batch()]
        scales = quant.calibrate_scales(params, calib_batches, scale_factor)
        qtree = quant.quantize_generator_params(
            params, only=quant.is_ups_module
        )
        params = {"q": qtree, "s": dict(scales)}

        def apply(p, x):
            return quant.sr_quant_forward(
                p["q"], p["s"], x, scale_factor, glue_dtype=glue
            )
    elif lr_tail:
        from fast_srgan_tpu.ops.lr_tail import generator_apply_lr_tail

        def apply(p, x):
            return generator_apply_lr_tail(model, p, x)
    else:
        apply = model.apply

    params = jax.tree.map(jnp.asarray, params)

    def forward_u8(x_u8):
        # Shared with SRInferenceEngine._forward_u8 — one definition of the
        # serving normalization, so artifacts can't drift from live serving.
        from fast_srgan_tpu.inference import sr_forward_u8

        return sr_forward_u8(apply, params, x_u8)

    return forward_u8


def export_shape(
    forward_u8,
    batch: int,
    height: int,
    width: int,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower + export the forward for one NHWC uint8 input shape."""
    import jax
    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch, height, width, 3), np.uint8)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jexport.export(jax.jit(forward_u8), **kwargs)(spec)


def save_exported_dir(
    out_dir: str,
    entries: List[Tuple[Tuple[int, int, int], Any]],
    *,
    arch: Dict[str, int],
    bf16: bool,
    lr_tail: bool,
    quantize: bool = False,
) -> str:
    """Write manifest.json + one .stablehlo blob per (shape, exported).

    Each manifest entry records the serialized blob's size in bytes.
    Duplicate shapes are rejected: they would overwrite each other's blob
    file and collapse silently on load (dict-key overwrite)."""
    shapes = [s for s, _ in entries]
    dupes = {s for s in shapes if shapes.count(s) > 1}
    if dupes:
        raise ValueError(f"duplicate export shapes (b, h, w): {sorted(dupes)}")
    os.makedirs(out_dir, exist_ok=True)
    table = []
    for (b, h, w), exp in entries:
        name = f"b{b}_{h}x{w}.stablehlo"
        blob = exp.serialize()
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        table.append(
            {
                "file": name,
                "batch": b,
                "height": h,
                "width": w,
                "bytes": len(blob),
                "platforms": list(exp.platforms),
            }
        )
    manifest = {
        "format": "fast-srgan-tpu/stablehlo-v1",
        "arch": arch,
        "bf16": bf16,
        "lr_tail": lr_tail,
        "quantize": quantize,  # int8 PTQ tier baked in (ups-only policy)
        "entries": table,
    }
    path = os.path.join(out_dir, MANIFEST)
    with open(path, "w") as f:
        json.dump(manifest, f, indent=1)
    return path


def load_exported_dir(out_dir: str) -> Dict[str, Any]:
    """Load an artifact directory -> {"manifest": ..., "forwards":
    {(b, h, w): callable}}. Callables take a uint8 NHWC array and return
    the uint8 SR output; no model code or checkpoint is touched."""
    from jax import export as jexport

    with open(os.path.join(out_dir, MANIFEST)) as f:
        manifest = json.load(f)
    forwards = {}
    for e in manifest["entries"]:
        with open(os.path.join(out_dir, e["file"]), "rb") as f:
            exp = jexport.deserialize(f.read())
        forwards[(e["batch"], e["height"], e["width"])] = exp.call
    return {"manifest": manifest, "forwards": forwards}
