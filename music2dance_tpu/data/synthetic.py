"""Synthetic data generators for tests and benchmarks.

The reference dataset is not obtainable (empty reference mount, SURVEY.md
§0) and no dance corpus ships in this container, so benchmarks and the
end-to-end training slice run on synthetic (waveform, pose) clip pairs
with the exact shapes of the real contract: feats [B, T, F] at the audio
feature rate, poses [B, T, n_joints*joint_dim] aligned 1:1 with feature
frames (SURVEY.md §2 C2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import AudioConfig, extract_features
from ..models.configs import JointLayout


def synthetic_waveforms(key: jax.Array, batch: int, seconds: float, cfg: AudioConfig) -> jax.Array:
    """[B, L] band-limited musical-ish waveforms (tones + noise)."""
    n = cfg.num_samples(seconds)
    k1, k2, k3 = jax.random.split(key, 3)
    t = jnp.arange(n, dtype=jnp.float32) / cfg.sample_rate
    freqs = jax.random.uniform(k1, (batch, 3), minval=60.0, maxval=2000.0)
    phases = jax.random.uniform(k2, (batch, 3), maxval=2.0 * jnp.pi)
    tones = jnp.sin(
        2.0 * jnp.pi * freqs[:, :, None] * t[None, None, :] + phases[:, :, None]
    ).sum(axis=1)
    noise = 0.1 * jax.random.normal(k3, (batch, n))
    return (0.3 * tones + noise).astype(jnp.float32)


def synthetic_poses(key: jax.Array, batch: int, t: int, layout: JointLayout) -> jax.Array:
    """[B, T, P] smooth random-walk pose sequences (bounded, dance-like)."""
    p = layout.pose_dim
    k1, k2 = jax.random.split(key)
    base = jax.random.normal(k1, (batch, 1, p)) * 0.5
    vel = jax.random.normal(k2, (batch, t, p)) * 0.05
    walk = jnp.cumsum(vel, axis=1)
    return (base + jnp.tanh(walk)).astype(jnp.float32)


def synthetic_batch(
    key: jax.Array,
    batch: int,
    seconds: float,
    audio_cfg: AudioConfig = AudioConfig(),
    layout: JointLayout = JointLayout(),
    through_frontend: bool = True,
) -> dict:
    """A {"feats", "poses"} clip batch.

    ``through_frontend=True`` runs real waveforms through the full MFCC
    chain (end-to-end path); ``False`` draws features directly (fast unit
    tests that don't exercise the frontend).
    """
    kw, kp, kf = jax.random.split(key, 3)
    if through_frontend:
        waves = synthetic_waveforms(kw, batch, seconds, audio_cfg)
        feats = extract_features(waves, audio_cfg)
    else:
        t = audio_cfg.num_frames(audio_cfg.num_samples(seconds))
        feats = jax.random.normal(kf, (batch, t, audio_cfg.n_features))
    poses = synthetic_poses(kp, batch, feats.shape[1], layout)
    return {"feats": feats, "poses": poses}


def numpy_clip_dataset(
    seed: int,
    n_clips: int,
    seconds: float,
    audio_cfg: AudioConfig = AudioConfig(),
    layout: JointLayout = JointLayout(),
) -> list[dict]:
    """Host-side synthetic dataset of single clips (for the data pipeline)."""
    rng = np.random.default_rng(seed)
    n = audio_cfg.num_samples(seconds)
    t = audio_cfg.num_frames(n)
    clips = []
    for _ in range(n_clips):
        wave = rng.standard_normal(n).astype(np.float32) * 0.2
        pose = np.cumsum(rng.standard_normal((t, layout.pose_dim)) * 0.05, axis=0)
        clips.append({"wave": wave, "pose": np.tanh(pose).astype(np.float32)})
    return clips
