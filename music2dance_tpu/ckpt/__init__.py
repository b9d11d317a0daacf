"""Checkpointing: orbax state I/O + PyTorch checkpoint converter."""

from .orbax_io import (
    checkpoint_steps,
    configs_from_json,
    configs_to_json,
    restore_bundle,
    restore_checkpoint,
    save_checkpoint,
)
from .torch_convert import (
    flax_to_torch_state_dict,
    load_torch_checkpoint,
    save_torch_checkpoint,
    torch_state_dict_to_flax,
)

__all__ = [
    "checkpoint_steps",
    "configs_from_json",
    "configs_to_json",
    "restore_bundle",
    "restore_checkpoint",
    "save_checkpoint",
    "flax_to_torch_state_dict",
    "load_torch_checkpoint",
    "save_torch_checkpoint",
    "torch_state_dict_to_flax",
]
