"""TPU kernels and kernel-adjacent ops (Pallas lives here and in audio/)."""

from .fused_dcore import fused_d_phase, make_d_core
from .fused_gdual import fused_dual_apply, make_dual_scan
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
    "fused_d_phase",
    "fused_dual_apply",
    "fused_generator_forward",
    "make_d_core",
    "make_dual_scan",
    "supports_fused",
]
