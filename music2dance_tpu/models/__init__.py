"""Sequence models: generator and critic over pose sequences."""

from .configs import (
    DiscriminatorConfig,
    GANConfig,
    GeneratorConfig,
    JointLayout,
    full_gan,
    tiny_gan,
    transformer_gan,
)
from .cells import GRUCell, LSTMCell, RNNCore, init_rnn_carry, num_gates
from .generator import Generator, generator_init_carry
from .discriminator import Discriminator, discriminator_init_carry
from .factory import build_discriminator, build_generator

__all__ = [
    "transformer_gan",
    "build_generator",
    "build_discriminator",
    "DiscriminatorConfig",
    "GANConfig",
    "GeneratorConfig",
    "JointLayout",
    "full_gan",
    "tiny_gan",
    "GRUCell",
    "LSTMCell",
    "RNNCore",
    "init_rnn_carry",
    "num_gates",
    "Generator",
    "generator_init_carry",
    "Discriminator",
    "discriminator_init_carry",
]
