"""Evaluation metric sanity: the metrics must rank obvious cases correctly."""

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.eval import (
    beat_alignment,
    evaluate_generation,
    motion_diversity,
    motion_statistics,
)

AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)


def test_motion_statistics_orders_obvious_cases():
    t = 30
    frozen = jnp.zeros((2, t, 4, 3))
    smooth = jnp.stack([jnp.sin(jnp.linspace(0, 4, t))] * 12, -1).reshape(1, t, 4, 3)
    smooth = jnp.tile(smooth, (2, 1, 1, 1))
    jitter = jax.random.normal(jax.random.key(0), (2, t, 4, 3))

    s_frozen = motion_statistics(frozen)
    s_smooth = motion_statistics(smooth)
    s_jitter = motion_statistics(jitter)
    assert float(s_frozen["mean_velocity"]) < 1e-6
    assert float(s_smooth["mean_velocity"]) > 1e-3
    assert float(s_jitter["mean_jerk"]) > float(s_smooth["mean_jerk"])


def test_diversity_detects_mode_collapse():
    t = 20
    one = jax.random.normal(jax.random.key(0), (1, t, 4, 3))
    collapsed = jnp.tile(one, (6, 1, 1, 1))
    diverse = jax.random.normal(jax.random.key(1), (6, t, 4, 3))
    assert float(motion_diversity(collapsed)) < 1e-6
    assert float(motion_diversity(diverse)) > 0.1


def test_beat_alignment_prefers_aligned_motion():
    # pulsed audio: clicks every 0.25 s; motion that freezes on each click
    sr, secs = AUDIO.sample_rate, 2.0
    n = AUDIO.num_samples(secs)
    t_axis = np.arange(n) / sr
    click = ((t_axis % 0.25) < 0.01).astype(np.float32)
    wave = jnp.asarray((click * np.sin(2 * np.pi * 880 * t_axis)).astype(np.float32))[None]

    t_frames = AUDIO.num_frames(n)
    frame_t = np.arange(t_frames) / AUDIO.feature_rate
    # aligned: speed dips exactly at click times; misaligned: shifted by 0.125 s
    phase = (frame_t % 0.25) / 0.25
    speed_aligned = np.sin(np.pi * phase)          # min at clicks
    speed_shifted = np.sin(np.pi * ((phase + 0.5) % 1.0))

    def poses_from_speed(speed):
        pos = np.cumsum(speed)[:, None, None] * np.ones((1, 4, 3)) * 0.01
        return jnp.asarray(pos[None].astype(np.float32))

    a = float(beat_alignment(poses_from_speed(speed_aligned), wave, AUDIO))
    b = float(beat_alignment(poses_from_speed(speed_shifted), wave, AUDIO))
    assert a > b


def test_evaluate_generation_returns_finite_suite():
    b, secs = 3, 1.0
    n = AUDIO.num_samples(secs)
    wave = jax.random.normal(jax.random.key(0), (b, n)) * 0.2
    t = AUDIO.num_frames(n)
    gen = jax.random.normal(jax.random.key(1), (b, t, 4, 3)) * 0.1
    real = jax.random.normal(jax.random.key(2), (b, t, 4, 3)) * 0.1
    out = evaluate_generation(gen, real, wave, AUDIO)
    assert len(out) >= 10
    for k, v in out.items():
        assert np.isfinite(float(v)), k
