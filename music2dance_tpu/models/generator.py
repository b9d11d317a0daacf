"""Sequence generator: audio features (+ noise) -> pose sequence.

Capability contract [BASELINE]: "sequence generator ... recurrent/conv
stacks over pose sequences", autoregressive motion decoding at inference,
1-layer degenerate config (tiny) and a full architecture (full).

TPU-first structure:
- The conv audio encoder and the layer-0 input projection of
  (enc_t, z) run over the WHOLE sequence outside the time scan — one large
  MXU matmul instead of T small ones.
- The `lax.scan` (via nn.scan) per-step body touches only what the
  recurrence forces to be sequential: the pose-feedback projection, the
  hidden-side cell matmuls, and the pose head.
- Exactly the same module serves training (one jitted forward over T) and
  autoregressive inference (same scan; the pose feedback makes it AR by
  construction), so there is no train/infer architecture skew.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cells import RNNCore, init_rnn_carry, num_gates
from .configs import GeneratorConfig

Carry = Any  # (rnn_carry, prev_pose [B, P])


def append_onset_channel(feats: jax.Array) -> jax.Array:
    """[B, T, F] -> [B, T, F+1]: explicit onset channel for the generator.

    The channel is the CAUSAL positive temporal flux of MFCC c0 (with an
    orthonormal DCT, c0 = sqrt(M) x mean log-mel — the onset signal the
    eval metric beats against; train/conditioning.py derives the same
    proxy). No whole-clip normalization on purpose: c0 is already
    standardized by the frontend's per-clip normalize, and keeping the
    channel local (one-frame lookback, zero at t=0) is what makes it
    exact for full-clip training and decode. Structural-conditioning
    lever (round-5): the beat->motion coupling becomes a direct input
    the generator can gate on, instead of something the beat auxiliary
    must carve into the weights against the adversarial gradient.
    """
    c0 = feats[..., 0]
    flux = jnp.maximum(c0[:, 1:] - c0[:, :-1], 0.0)
    flux = jnp.pad(flux, ((0, 0), (1, 0)))
    return jnp.concatenate(
        [feats, flux[..., None].astype(feats.dtype)], axis=-1
    )


class AudioEncoder(nn.Module):
    """Temporal conv stack over [B, T, F] -> [B, T, enc_dim]."""

    cfg: GeneratorConfig

    @nn.compact
    def __call__(self, feats):
        x = feats
        if self.cfg.onset_channel:
            x = append_onset_channel(x)
        for l in range(self.cfg.enc_layers):
            x = nn.Conv(self.cfg.enc_dim, (self.cfg.enc_kernel,), padding="SAME",
                        name=f"conv_{l}", dtype=self.cfg.dtype)(x)
            x = nn.relu(x)
        return x


class GeneratorStep(nn.Module):
    """One scan step. xs = (gi_static_t [B, G*H], tf_prev_t [B, P])."""

    cfg: GeneratorConfig
    teacher_forcing: bool = False

    @nn.compact
    def __call__(self, carry: Carry, xs):
        rnn_carry, prev_pose = carry
        gi_static_t, tf_prev_t = xs
        cfg = self.cfg
        g = num_gates(cfg.cell)

        prev = tf_prev_t if self.teacher_forcing else prev_pose
        if not cfg.autoregressive:
            prev = jnp.zeros_like(prev)
        gi0 = gi_static_t + nn.Dense(
            g * cfg.hidden_dim, use_bias=False, name="ih0_pose", dtype=cfg.dtype
        )(prev)

        rnn_carry, h_top = RNNCore(
            cfg.hidden_dim, cfg.rnn_layers, cfg.cell, cfg.dtype, name="core"
        )(rnn_carry, gi0)

        y = nn.relu(nn.Dense(cfg.head_hidden, name="head_fc", dtype=cfg.dtype)(h_top))
        # pose head output in float32: poses feed losses and AR integration
        out = nn.Dense(cfg.pose_dim, name="head_out", dtype="float32")(
            y.astype(jnp.float32)
        )
        pose = prev + out if cfg.residual_pose else out
        return (rnn_carry, pose), pose


class Generator(nn.Module):
    """G(feats [B,T,F], z [B,Z]) -> poses [B, T, n_joints*joint_dim].

    ``carry``/``return_carry`` expose the recurrent state for truncated
    BPTT (state carried across 30 s windows [BASELINE]) and for streaming
    decode. ``tf_poses`` (shifted real poses) enables teacher forcing.
    """

    cfg: GeneratorConfig

    @nn.compact
    def __call__(
        self,
        feats: jax.Array,
        z: jax.Array,
        carry: Optional[Carry] = None,
        tf_poses: Optional[jax.Array] = None,
        return_carry: bool = False,
    ):
        cfg = self.cfg
        b, t, _ = feats.shape
        g = num_gates(cfg.cell)

        enc = AudioEncoder(cfg, name="encoder")(feats)                  # [B,T,E]
        z_seq = jnp.broadcast_to(z[:, None, :], (b, t, cfg.noise_dim))
        static_in = jnp.concatenate([enc, z_seq], axis=-1)
        gi_static = nn.Dense(g * cfg.hidden_dim, name="ih0_static",
                             dtype=cfg.dtype)(static_in)  # hoisted

        if carry is None:
            carry = self.init_carry(b)

        teacher_forcing = tf_poses is not None
        if tf_poses is None:
            tf_poses = jnp.zeros((b, t, cfg.pose_dim), feats.dtype)

        scan = nn.scan(
            GeneratorStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry_out, poses = scan(cfg, teacher_forcing, name="step")(
            carry, (gi_static, tf_poses)
        )
        if return_carry:
            return poses, carry_out
        return poses

    def init_carry(self, batch: int, dtype=jnp.float32) -> Carry:
        cfg = self.cfg
        rnn_carry = init_rnn_carry(cfg.cell, cfg.rnn_layers, batch, cfg.hidden_dim, dtype)
        return (rnn_carry, jnp.zeros((batch, cfg.pose_dim), dtype))


def generator_init_carry(cfg: GeneratorConfig, batch: int, dtype=jnp.float32) -> Carry:
    rnn_carry = init_rnn_carry(cfg.cell, cfg.rnn_layers, batch, cfg.hidden_dim, dtype)
    return (rnn_carry, jnp.zeros((batch, cfg.pose_dim), dtype))
