"""Inference: batched autoregressive motion decoding."""

from .decode import decode_poses, jit_decoder, streaming_decode_step
from .api import Music2DanceModel
from .serving import (BatchingEngine, CheckpointWatcher, InferenceServer,
                      ServingConfig)
from .export import ExportedDecoder, export_decoder
from .poses_io import load_poses, save_poses
from .streaming import (
    FrontendStats,
    StreamingFeatureExtractor,
    StreamingGenerator,
    StreamingSession,
)

__all__ = [
    "decode_poses", "jit_decoder", "streaming_decode_step", "Music2DanceModel",
    "BatchingEngine", "CheckpointWatcher", "InferenceServer",
    "ServingConfig",
    "ExportedDecoder", "export_decoder", "load_poses", "save_poses",
    "FrontendStats", "StreamingFeatureExtractor", "StreamingGenerator",
    "StreamingSession",
]
