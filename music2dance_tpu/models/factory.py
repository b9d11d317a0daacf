"""Model-family selection: config -> nn.Module.

Every layer above the models (train step, TBPTT, decode, eval, serving)
builds its modules through these two functions, so adding a family is a
models/-only change. ``arch`` lives on the config (checkpointed via the
config bundle), which means a restored run always rebuilds the family it
was trained as.
"""

from __future__ import annotations

import flax.linen as nn

from .configs import DiscriminatorConfig, GeneratorConfig
from .discriminator import Discriminator
from .generator import Generator


def build_generator(cfg: GeneratorConfig) -> nn.Module:
    if cfg.arch == "rnn":
        return Generator(cfg)
    if cfg.arch == "transformer":
        from .transformer import TransformerGenerator

        return TransformerGenerator(cfg)
    raise ValueError(f"unknown generator arch {cfg.arch!r} "
                     "(expected 'rnn' or 'transformer')")


def build_discriminator(cfg: DiscriminatorConfig) -> nn.Module:
    if cfg.arch == "rnn":
        return Discriminator(cfg)
    if cfg.arch == "transformer":
        from .transformer import TransformerCritic

        return TransformerCritic(cfg)
    raise ValueError(f"unknown discriminator arch {cfg.arch!r} "
                     "(expected 'rnn' or 'transformer')")
