"""Named presets mirroring the five BASELINE.json benchmark configs."""

from __future__ import annotations

import dataclasses

from ..audio import AudioConfig
from ..models.configs import GANConfig, JointLayout, full_gan, tiny_gan
from ..train.config import TrainConfig


@dataclasses.dataclass(frozen=True)
class Preset:
    name: str
    description: str
    gan: GANConfig
    train: TrainConfig
    audio: AudioConfig


def _audio() -> AudioConfig:
    return AudioConfig()


def preset(name: str, layout: JointLayout = JointLayout()) -> Preset:
    audio = _audio()
    f = audio.n_features
    table = {
        # BASELINE config #2
        "tiny": Preset(
            "tiny",
            "1-layer recurrent G+D, batch 8, 3 s clips",
            tiny_gan(f, layout),
            TrainConfig(batch_size=8, clip_seconds=3.0),
            audio,
        ),
        # BASELINE config #3
        "full": Preset(
            "full",
            "full G/D architecture, batch 32, 6 s clips",
            full_gan(f, layout),
            TrainConfig(batch_size=32, clip_seconds=6.0),
            audio,
        ),
        # BASELINE config #4 (window = 3 s at the 30 Hz feature rate)
        "long": Preset(
            "long",
            "30 s clips, truncated BPTT (90-frame windows), batch 16",
            full_gan(f, layout),
            TrainConfig(batch_size=16, clip_seconds=30.0, tbptt_window=90),
            audio,
        ),
    }
    if name not in table:
        raise KeyError(f"unknown preset {name!r}; have {sorted(table)}")
    return table[name]


PRESET_NAMES = ("tiny", "full", "long")
