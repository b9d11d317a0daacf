"""Audio feature frontend (librosa-compatible, TPU-native)."""

from .params import AudioConfig, DEFAULT_AUDIO
from .frontend import (
    extract_features,
    jit_extract_features,
    melspectrogram,
    mfcc,
    normalize_per_clip,
    power_to_db,
    stft_power,
)

__all__ = [
    "AudioConfig",
    "DEFAULT_AUDIO",
    "extract_features",
    "jit_extract_features",
    "melspectrogram",
    "mfcc",
    "normalize_per_clip",
    "power_to_db",
    "stft_power",
]
