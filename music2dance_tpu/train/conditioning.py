"""Conditioning-strengthening auxiliaries: make G actually listen.

Round-3 finding (benchmarks/RESULTS.md): both families matched the
motion marginals (FMD -> ~0.1-0.25) while held-out beat alignment sat at
~2x the mismatched-null — the adversarial signal alone under-rewards
*music-conditioned* motion, because a critic can drive its Wasserstein
gap almost entirely from motion statistics. Two levers close the loop:

1. MISMATCH CRITIC TERM (``tc.mismatch_weight``) — the matching-aware
   critic of the conditional-GAN literature: real poses paired with the
   WRONG audio are scored as an extra fake class. A critic that ignores
   its audio input cannot separate (real, matched) from (real,
   mismatched) — the term is flat in everything but audio-dependence —
   so the critic is forced to use audio, and G inherits that pressure
   through the adversarial gradient. Pairs are drawn by rolling the
   (per-device, per-microbatch) batch by one: deterministic, shape-free,
   and every example serves once as a negative.

2. BEAT-ALIGNMENT AUXILIARY (``tc.beat_loss_weight``) — a differentiable
   train-time twin of eval/metrics.py's beat_alignment: maximize the
   lag-windowed cross-correlation between the generated body-speed
   envelope (negated — dancers pause on the beat) and the audio onset
   envelope. Eval computes onsets from the waveform's log-mel flux; the
   train step only has normalized MFCCs, so the onset proxy here is the
   positive temporal difference of MFCC c0 — with an orthonormal DCT,
   c0 is exactly sqrt(M) * mean-over-mels of the log-mel, i.e. the same
   signal up to scale, and both envelopes are z-normalized so scale
   cancels. (relu-of-mean vs eval's mean-of-relu is the one honest
   difference; tests/test_conditioning.py pins the proxy's correlation
   with the eval onset on real audio.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def onset_proxy_from_feats(feats: jax.Array) -> jax.Array:
    """[B, T, F] normalized MFCCs -> [B, T] standardized onset proxy.

    Positive temporal difference of c0 (the energy coefficient),
    z-normalized per clip. Feature normalization (a per-coefficient
    affine) only rescales c0, and the z-norm removes that.
    """
    c0 = feats[..., 0]
    flux = jnp.maximum(c0[:, 1:] - c0[:, :-1], 0.0)
    flux = jnp.pad(flux, ((0, 0), (1, 0)))
    mean = jnp.mean(flux, axis=1, keepdims=True)
    std = jnp.std(flux, axis=1, keepdims=True) + 1e-6
    return (flux - mean) / std


def speed_envelope(poses: jax.Array) -> jax.Array:
    """[B, T, P] flat poses -> [B, T] standardized body-speed envelope
    (eval/metrics.py kinematic_envelope, without the joint reshape —
    the joint axis is summed either way)."""
    vel = poses[:, 1:] - poses[:, :-1]
    speed = jnp.sqrt(jnp.sum(vel * vel, axis=-1) + 1e-12)
    speed = jnp.pad(speed, ((0, 0), (1, 0)))
    mean = jnp.mean(speed, axis=1, keepdims=True)
    std = jnp.std(speed, axis=1, keepdims=True) + 1e-6
    return (speed - mean) / std


def beat_alignment_loss(
    fake_poses: jax.Array, feats: jax.Array, max_lag: int = 3
) -> jax.Array:
    """Negative soft beat alignment of generated poses — a LOSS (lower =
    better aligned). Same +-max_lag max-correlation window as the eval
    metric; the max is a subgradient point but piecewise-smooth, which
    is all Adam needs."""
    onset = onset_proxy_from_feats(feats.astype(jnp.float32))
    kin = -speed_envelope(fake_poses.astype(jnp.float32))
    t = min(onset.shape[1], kin.shape[1])
    onset, kin = onset[:, :t], kin[:, :t]

    def corr_at(lag):
        if lag >= 0:
            a, b_ = onset[:, lag:], kin[:, : t - lag]
        else:
            a, b_ = onset[:, : t + lag], kin[:, -lag:]
        return jnp.mean(a * b_, axis=1)

    corrs = jnp.stack(
        [corr_at(lag) for lag in range(-max_lag, max_lag + 1)], axis=0
    )
    return -jnp.mean(jnp.max(corrs, axis=0))


def mismatch_pairs(feats: jax.Array) -> jax.Array:
    """Audio for the mismatched (real-pose, wrong-audio) negative class:
    the batch rolled by one. Per-device and per-microbatch on purpose —
    negative sampling needs wrongness, not global coherence (documented
    in the module docstring; a DP shard rolls its local slice)."""
    return jnp.roll(feats, 1, axis=0)
