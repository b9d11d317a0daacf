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
    transformer_gan,
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
    # Attention family (models/transformer.py): causal-attention G +
    # attention critic at flagship scale. Training and decoding are
    # parallel over time — no sequential scan anywhere, so the step is
    # pure batched MXU work without any custom kernel
    # (benchmarks/run_transformer.py for the measured comparison).
    table["attn"] = Preset(
        "attn",
        "attention (transformer) G+D, batch 32, 6 s clips",
        transformer_gan(f, layout),
        TrainConfig(batch_size=32, clip_seconds=6.0),
        audio,
    )
    # Long-clip attention training: WHOLE 30 s clips in one step — no
    # TBPTT, no window carry. The generator's attention rides the Pallas
    # flash kernel (T=905 -> padded 1024; no [T, T] materialization),
    # which is what makes this length feasible at all. The critic is the
    # dilated TCN (perf preset's): the WGAN-GP second order through a
    # T=905 attention critic would need either the [T, T] logits tensor
    # (hundreds of GB) or grad-of-grad through the flash kernel (its VJP
    # is first-order only) — the conv critic's GP is pure MXU instead.
    table["attn_long"] = Preset(
        "attn_long",
        "attention G (flash) + dilated TCN critic, whole 30 s clips, no TBPTT",
        GANConfig(
            generator=transformer_gan(f, layout).generator,
            discriminator=dataclasses.replace(
                full_gan(f, layout).discriminator,
                rnn_layers=0, conv_layers=4, conv_dilation=2, conv_dim=256,
            ),
        ),
        TrainConfig(batch_size=16, clip_seconds=30.0),
        audio,
    )
    # Long-clip attention training with an ATTENTION critic: the round-3
    # gap attn_long documents ("grad-of-grad through the flash kernel")
    # is closed by the second-order flash core (ops/flash2.py) — the
    # critic's 'auto' routing rides it at T >= 256, so the WGAN-GP
    # second order streams blockwise instead of materializing the
    # [B, heads, T, T] logits at every differentiation level.
    table["attn_long_ac"] = Preset(
        "attn_long_ac",
        "attention G (flash) + attention critic (flash2), whole 30 s clips",
        transformer_gan(f, layout),
        TrainConfig(batch_size=16, clip_seconds=30.0),
        audio,
    )
    if name not in table:
        raise KeyError(f"unknown preset {name!r}; have {sorted(table)}")
    return table[name]


PRESET_NAMES = ("tiny", "full", "long", "perf", "attn", "attn_long",
                "attn_long_ac")
