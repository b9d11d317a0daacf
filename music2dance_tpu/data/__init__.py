"""Data: synthetic generators, grain pipeline, WAV codec."""

from .synthetic import numpy_clip_dataset, synthetic_batch, synthetic_poses, synthetic_waveforms
from .wav import load_wav, save_wav
from .bvh import load_bvh_poses
from .device_store import DeviceFeatureStore

__all__ = [
    "load_bvh_poses",
    "numpy_clip_dataset",
    "synthetic_batch",
    "synthetic_poses",
    "synthetic_waveforms",
    "load_wav",
    "save_wav",
    "DeviceFeatureStore",
]
