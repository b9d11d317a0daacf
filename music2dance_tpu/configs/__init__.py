"""Named presets mirroring the BASELINE benchmark configs."""

from .presets import PRESET_NAMES, Preset, preset

__all__ = ["PRESET_NAMES", "Preset", "preset"]
