"""Critic: pose sequence (optionally audio-conditioned) -> scalar score.

Capability contract [BASELINE]: "discriminator ... recurrent/conv stacks
over pose sequences"; the gradient-penalty objective makes it a WGAN
critic (unbounded scalar output, no sigmoid, no batch norm).

TPU-first structure: the critic has NO autoregressive feedback, so its
ENTIRE input path — conv stack + layer-0 input projection — is computed
over the full sequence outside the scan. The per-step body is purely the
hidden-side cell matmuls. Per-step scores are averaged over time (denser
critic signal than last-state-only, and it keeps the gradient-penalty
gradient spread across all frames).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .cells import RNNCore, init_rnn_carry, num_gates
from .configs import DiscriminatorConfig

Carry = Any


class DiscStep(nn.Module):
    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(self, carry, gi0_t):
        carry, h_top = RNNCore(
            self.cfg.hidden_dim, self.cfg.rnn_layers, self.cfg.cell,
            self.cfg.dtype, name="core"
        )(carry, gi0_t)
        # critic scores in float32: they feed losses and the grad penalty
        score_t = nn.Dense(1, name="score", dtype="float32")(
            h_top.astype(jnp.float32)
        )  # [B, 1]
        return carry, score_t


class Discriminator(nn.Module):
    """D(poses [B,T,P], feats [B,T,F]) -> score [B]."""

    cfg: DiscriminatorConfig

    @nn.compact
    def __call__(
        self,
        poses: jax.Array,
        feats: Optional[jax.Array] = None,
        carry: Optional[Carry] = None,
        return_carry: bool = False,
        return_features: bool = False,
    ):
        """``return_features``: also return the per-layer conv activations
        (a list of [B, T, C] arrays) — the embedding the feature-matching
        auxiliary loss compares between real and generated poses
        (train/losses.feature_matching; MelGAN-style stabilizer from the
        retrieved-pattern papers, PAPERS.md)."""
        cfg = self.cfg
        b, t, _ = poses.shape
        g = num_gates(cfg.cell)

        if cfg.n_scales > 1:
            if cfg.rnn_layers != 0:
                raise ValueError(
                    "n_scales > 1 requires the TCN critic family "
                    "(rnn_layers == 0) — the multi-scale pattern is conv-"
                    "based and recurrent carries are single-scale"
                )
            return self._multi_scale(poses, feats, return_carry,
                                     return_features, b)

        x = poses
        if cfg.conditional:
            if feats is None:
                raise ValueError("conditional critic requires audio features")
            x = jnp.concatenate([poses, feats], axis=-1)

        features = []
        for l in range(cfg.conv_layers):
            x = nn.Conv(cfg.conv_dim, (cfg.conv_kernel,), padding="SAME",
                        name=f"conv_{l}", dtype=cfg.dtype,
                        kernel_dilation=(cfg.conv_dilation**l,))(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            features.append(x)

        def pack(score, extra_carry=None):
            out = (score,)
            if return_carry:
                out += (extra_carry,)
            if return_features:
                out += (features,)
            return out if len(out) > 1 else out[0]

        if cfg.rnn_layers == 0:
            # conv-only (TCN) critic: no scan at all — every op is a conv/
            # matmul, which makes the WGAN-GP second-order autodiff path
            # pure MXU work (fastest critic on TPU; "recurrent/conv stacks"
            # [BASELINE] admits both families)
            h = nn.leaky_relu(
                nn.Dense(cfg.hidden_dim, name="tcn_fc", dtype=cfg.dtype)(x), 0.2
            )
            features.append(h)
            scores = nn.Dense(1, name="score", dtype="float32")(
                h.astype(jnp.float32)
            )  # [B, T, 1]
            score = jnp.mean(scores, axis=(1, 2))
            return pack(score, self.init_carry(b))

        gi = nn.Dense(g * cfg.hidden_dim, name="ih0", dtype=cfg.dtype)(x)  # hoisted

        if carry is None:
            carry = self.init_carry(b)

        scan = nn.scan(
            DiscStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )
        carry_out, scores = scan(cfg, name="step")(carry, gi)  # scores [B,T,1]
        score = jnp.mean(scores, axis=(1, 2))                  # [B]
        return pack(score, carry_out)

    def _multi_scale(self, poses, feats, return_carry, return_features, b):
        """MelGAN-pattern multi-scale TCN ensemble: scale s scores the
        inputs avg-pooled by 2^s along time with its OWN conv stack
        (params under scale{s}_*; scale 0 uses the unprefixed names so
        n_scales=1 checkpoints stay loadable); score = scale mean. Pooling
        is a linear op, so the WGAN-GP second order remains pure MXU."""
        cfg = self.cfg
        scores, features = [], []
        for s in range(cfg.n_scales):
            if s == 0:
                ps, fs = poses, feats
            else:
                k = 2 ** s
                ps = nn.avg_pool(poses, (k,), strides=(k,))
                fs = None if feats is None else nn.avg_pool(feats, (k,),
                                                            strides=(k,))
            x = ps
            if cfg.conditional:
                if fs is None:
                    raise ValueError("conditional critic requires audio features")
                x = jnp.concatenate([ps, fs], axis=-1)
            prefix = "" if s == 0 else f"scale{s}_"
            for l in range(cfg.conv_layers):
                x = nn.Conv(cfg.conv_dim, (cfg.conv_kernel,), padding="SAME",
                            name=f"{prefix}conv_{l}", dtype=cfg.dtype,
                            kernel_dilation=(cfg.conv_dilation**l,))(x)
                x = nn.leaky_relu(x, negative_slope=0.2)
                features.append(x)
            h = nn.leaky_relu(
                nn.Dense(cfg.hidden_dim, name=f"{prefix}tcn_fc",
                         dtype=cfg.dtype)(x), 0.2
            )
            features.append(h)
            sc = nn.Dense(1, name=f"{prefix}score", dtype="float32")(
                h.astype(jnp.float32)
            )
            scores.append(jnp.mean(sc, axis=(1, 2)))
        score = sum(scores) / len(scores)
        out = (score,)
        if return_carry:
            out += (self.init_carry(b),)
        if return_features:
            out += (features,)
        return out if len(out) > 1 else out[0]

    def init_carry(self, batch: int, dtype=jnp.float32) -> Carry:
        cfg = self.cfg
        return init_rnn_carry(cfg.cell, cfg.rnn_layers, batch, cfg.hidden_dim, dtype)


def discriminator_init_carry(cfg: DiscriminatorConfig, batch: int, dtype=jnp.float32) -> Carry:
    return init_rnn_carry(cfg.cell, cfg.rnn_layers, batch, cfg.hidden_dim, dtype)
