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


def test_frechet_distance_properties():
    """FMD: ~0 for same-distribution samples, larger for mismatched
    kinematics, symmetric-ish, and ranks degenerate motion as worse."""
    from music2dance_tpu.eval.metrics import (
        frechet_distance,
        frechet_motion_distance,
        kinematic_features,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 12)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((64, 12)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((64, 12)) * 3.0 + 2.0, jnp.float32)
    near = float(frechet_distance(x, y))
    far = float(frechet_distance(x, z))
    assert near < far * 0.2, (near, far)
    assert abs(float(frechet_distance(x, z)) - float(frechet_distance(z, x))) < 1e-2

    # pose-space: frozen motion is much farther from real than another
    # real-like batch is
    t, j, d = 40, 5, 3
    def walk(seed):
        r = np.random.default_rng(seed)
        return jnp.asarray(np.cumsum(r.standard_normal((16, t, j, d)) * 0.05,
                                     axis=1), jnp.float32)
    real_a, real_b = walk(1), walk(2)
    frozen = jnp.broadcast_to(real_b[:, :1], real_b.shape)
    d_rr = float(frechet_motion_distance(real_a, real_b))
    d_fr = float(frechet_motion_distance(frozen, real_b))
    assert d_rr < d_fr * 0.5, (d_rr, d_fr)
    kf = kinematic_features(real_a)
    assert kf.shape == (16, 4 * j)
    assert bool(jnp.all(jnp.isfinite(kf)))


def test_beat_corpus_alignment_separates_from_null():
    """The learnable corpus really is beat-locked: real (pose, audio)
    pairs score clearly above mismatched pairs."""
    from music2dance_tpu.data.synthetic import beat_driven_clip
    from music2dance_tpu.models.configs import JointLayout

    layout = JointLayout(n_joints=5, joint_dim=3)
    clips = [beat_driven_clip(np.random.default_rng((7, i)), 3.0, AUDIO, layout)
             for i in range(16)]
    waves = jnp.asarray(np.stack([c["wave"] for c in clips]))
    poses = jnp.asarray(np.stack([c["pose"] for c in clips])).reshape(16, -1, 5, 3)
    ba_real = float(beat_alignment(poses, waves, AUDIO))
    perm = np.random.default_rng(1).permutation(16)
    ba_null = float(beat_alignment(poses[perm], waves, AUDIO))
    assert ba_real > 0.25, ba_real
    assert ba_real > ba_null + 0.1, (ba_real, ba_null)
