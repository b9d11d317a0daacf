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


def beat_driven_clip(
    rng: np.random.Generator,
    seconds: float,
    audio_cfg: AudioConfig = AudioConfig(),
    layout: JointLayout = JointLayout(),
) -> dict:
    """One LEARNABLE (wave, pose) clip: motion driven by the music's beat.

    The structureless-noise corpora above exercise shapes and throughput
    but give a GAN nothing to learn (round-2 VERDICT missing #1). Here the
    audio has an explicit beat (kick bursts on the beat, hat bursts off
    the beat, a per-clip drone) and the poses are deterministically —
    plus per-clip style latents — driven by that beat:

    - joints orbit small circles at a shared phase rate that is steady
      BETWEEN beats and briefly freezes ON each beat (the dancer hits the
      pose). Circular orbits make per-joint speed exactly proportional to
      the phase rate — independent of where in the orbit the joint is —
      so the whole-body speed envelope is a clean spike-train complement
      of the onset envelope, which is what
      eval/metrics.beat_alignment correlates (negated speed vs onsets);
    - per-clip latent style: joint orbit planes, radii, base posture,
      orbit phase offsets (what the GAN's noise z must capture).

    Conditioned on the audio features, the motion distribution is
    concentrated and reachable; a training run that works shows
    held-out Wasserstein and FMD shrinking and the generated beat
    alignment approaching the real data's (tests/test_learning.py,
    benchmarks/RESULTS.md learning row).
    """
    sr = audio_cfg.sample_rate
    n = audio_cfg.num_samples(seconds)
    t_frames = audio_cfg.num_frames(n)
    hop = audio_cfg.hop_length

    bpm = rng.uniform(90.0, 150.0)
    period = 60.0 / bpm
    phase0 = rng.uniform(0.0, period)
    beat_times = np.arange(phase0, seconds + period, period)

    # --- audio: kick on beats, hats off-beat, per-clip drone, light noise
    slack = int(sr * 0.25)
    wave = np.zeros(n + slack, np.float32)
    kseg = np.arange(int(0.10 * sr))
    kick = (np.sin(2 * np.pi * 110.0 * kseg / sr) *
            np.exp(-kseg / (0.02 * sr))).astype(np.float32)
    for bt in beat_times:
        i0 = int(bt * sr)
        if i0 < n:
            wave[i0 : i0 + len(kseg)] += kick
    # no off-beat percussion: spectral-flux onsets must mark the beats and
    # nothing else, or the motion's off-beat speed peaks would correlate
    # with spurious onsets and wash the alignment signal out (the log-
    # scale flux makes even a quiet off-beat hit a full-size onset spike)
    wave = wave[:n]
    t_cont = np.arange(n, dtype=np.float64) / sr
    f0 = rng.uniform(150.0, 400.0)
    wave += 0.08 * np.sin(2 * np.pi * f0 * t_cont).astype(np.float32)
    wave += 0.01 * rng.standard_normal(n).astype(np.float32)
    wave *= 0.5

    # --- shared orbit phase rate: steady between beats, ~frozen on them
    frame_t = np.arange(t_frames) * hop / sr
    wf = max(0.08 * period, 1.5 * hop / sr)   # freeze width >= ~1.5 frames
    freeze = np.zeros(t_frames)
    for bt in beat_times:
        freeze += np.exp(-0.5 * ((frame_t - bt) / wf) ** 2)
    freeze = np.clip(freeze, 0.0, 1.0)
    frame_dt = hop / sr
    rate = (2.0 * np.pi / period) * (1.0 - 0.97 * freeze)   # rad/s
    phase = np.cumsum(rate) * frame_dt

    # --- per-clip latent style: orbit plane (orthonormal u, v), radius,
    # base posture, per-joint phase offset
    j, d = layout.n_joints, layout.joint_dim
    base = rng.normal(0.0, 0.25, (1, j, d))
    radius = rng.uniform(0.1, 0.3, (j, 1))
    u = rng.standard_normal((j, d))
    u /= np.linalg.norm(u, axis=-1, keepdims=True) + 1e-9
    v = rng.standard_normal((j, d))
    v -= (v * u).sum(-1, keepdims=True) * u
    v /= np.linalg.norm(v, axis=-1, keepdims=True) + 1e-9
    delta = rng.uniform(0.0, 2.0 * np.pi, (j,))

    ph = phase[:, None] + delta[None, :]                           # [T, J]
    pose = base + radius[None] * (np.cos(ph)[:, :, None] * u[None] +
                                  np.sin(ph)[:, :, None] * v[None])
    # slow per-clip wander + tiny jitter (keeps the conditional
    # distribution a distribution, not a point)
    wander = np.cumsum(rng.standard_normal((t_frames, j, d)) * 0.003, axis=0)
    pose = pose + wander + rng.standard_normal((t_frames, j, d)) * 0.004

    return {
        "wave": wave.astype(np.float32),
        "pose": pose.reshape(t_frames, j * d).astype(np.float32),
    }


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
