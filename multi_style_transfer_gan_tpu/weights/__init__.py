"""PyTorch checkpoint import/export (.pth) and conversion tooling."""

from .torch_import import (
    extract_state_dict,
    detect_model_kind,
    detect_channels,
    plain_generator_from_sd,
    enhanced_generator_from_sd,
    discriminator_from_sd,
    params_to_torch_sd, trainable_keys, adam_state_to_torch, adam_state_from_torch,
    load_pth,
    save_pth,
    convert_model,
    pth_info,
)

__all__ = [
    "extract_state_dict", "detect_model_kind", "detect_channels",
    "plain_generator_from_sd", "enhanced_generator_from_sd",
    "discriminator_from_sd", "params_to_torch_sd", "trainable_keys",
    "adam_state_to_torch", "adam_state_from_torch",
    "load_pth", "save_pth", "convert_model", "pth_info",
]
