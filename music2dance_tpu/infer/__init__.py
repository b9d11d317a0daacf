"""Inference: batched autoregressive motion decoding."""

from .decode import decode_poses, jit_decoder, streaming_decode_step
from .api import Music2DanceModel

__all__ = ["decode_poses", "jit_decoder", "streaming_decode_step", "Music2DanceModel"]
