"""Training: WGAN-GP losses, jitted alternating step, TBPTT, loop."""

from .config import TrainConfig
from .losses import critic_loss, generator_loss, gradient_penalty, critic_gradient_norms
from .preempt import PreemptionGuard
from .step import TrainState, init_state, jit_train_step, make_optimizers, make_train_step
from .tbptt import init_carries, make_tbptt_machinery, make_tbptt_train_step
from .sampled import make_sampling_train_step, shard_sampling_train_step

__all__ = [
    "TrainConfig",
    "PreemptionGuard",
    "critic_loss",
    "generator_loss",
    "gradient_penalty",
    "critic_gradient_norms",
    "TrainState",
    "init_state",
    "jit_train_step",
    "make_optimizers",
    "make_train_step",
    "init_carries",
    "make_tbptt_machinery",
    "make_tbptt_train_step",
    "make_sampling_train_step",
    "shard_sampling_train_step",
]
