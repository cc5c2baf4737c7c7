"""Checkpointing: Orbax-native save/restore + PyTorch interop converters."""

from fast_srgan_tpu.checkpoints.torch_compat import (
    load_reference_generator_params,
    generator_params_from_torch_state_dict,
    generator_params_to_torch_state_dict,
    vgg19_params_from_torch_state_dict,
)

__all__ = [
    "load_reference_generator_params",
    "generator_params_from_torch_state_dict",
    "generator_params_to_torch_state_dict",
    "vgg19_params_from_torch_state_dict",
]
