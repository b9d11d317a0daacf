"""Named presets mirroring the five BASELINE.json benchmark configs."""

from __future__ import annotations

import dataclasses

from ..audio import AudioConfig
from ..models.configs import (
    DiscriminatorConfig,
    GANConfig,
    JointLayout,
    full_gan,
    tiny_gan,
)
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
    # Performance preset: same generator, conv-only (TCN) critic with a
    # dilated receptive field. "recurrent/conv stacks" [BASELINE] admits
    # both critic families; the scan-free critic makes the WGAN-GP
    # second-order path pure MXU work (~2.4x steps/sec vs the rnn critic
    # on v5e; benchmarks/run_perf.py).
    table["perf"] = Preset(
        "perf",
        "full generator + dilated conv (TCN) critic, batch 32, 6 s clips",
        GANConfig(
            generator=full_gan(f, layout).generator,
            discriminator=dataclasses.replace(
                full_gan(f, layout).discriminator,
                rnn_layers=0, conv_layers=4, conv_dilation=2, conv_dim=256,
            ),
        ),
        TrainConfig(batch_size=32, clip_seconds=6.0),
        audio,
    )
    if name not in table:
        raise KeyError(f"unknown preset {name!r}; have {sorted(table)}")
    return table[name]


PRESET_NAMES = ("tiny", "full", "long", "perf")
