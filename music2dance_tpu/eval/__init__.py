"""Quantitative evaluation of generated motion."""

from .metrics import (
    beat_alignment,
    evaluate_generation,
    kinematic_envelope,
    motion_diversity,
    motion_statistics,
    onset_envelope,
)

__all__ = [
    "beat_alignment",
    "evaluate_generation",
    "kinematic_envelope",
    "motion_diversity",
    "motion_statistics",
    "onset_envelope",
]
