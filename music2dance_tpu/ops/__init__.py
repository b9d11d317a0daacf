"""TPU kernels and kernel-adjacent ops (Pallas lives here and in audio/)."""

from .fused_generator import (
    compute_gi_static,
    extract_step_weights,
    fused_apply,
    fused_generator_forward,
    supports_fused,
)

__all__ = [
    "compute_gi_static",
    "extract_step_weights",
    "fused_apply",
    "fused_generator_forward",
    "supports_fused",
]
