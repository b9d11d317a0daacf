"""Inference tests: shapes, determinism, masking, streaming equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.infer import Music2DanceModel, decode_poses, streaming_decode_step
from music2dance_tpu.models import Generator, GeneratorConfig, JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state
from music2dance_tpu.data.synthetic import synthetic_batch

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def trained_params():
    batch = synthetic_batch(
        jax.random.key(0), 2, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, TrainConfig(batch_size=2), batch)
    return state.g_params


def test_decode_shapes_and_determinism():
    g_params = trained_params()
    feats = jax.random.normal(jax.random.key(2), (3, 11, AUDIO.n_mfcc))
    p1 = decode_poses(g_params, GAN.generator, feats, jax.random.key(3))
    p2 = decode_poses(g_params, GAN.generator, feats, jax.random.key(3))
    assert p1.shape == (3, 11, LAYOUT.n_joints, LAYOUT.joint_dim)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    p3 = decode_poses(g_params, GAN.generator, feats, jax.random.key(4))
    assert not np.allclose(np.asarray(p1), np.asarray(p3))


def test_length_masking():
    g_params = trained_params()
    feats = jax.random.normal(jax.random.key(2), (2, 10, AUDIO.n_mfcc))
    lengths = jnp.array([10, 6])
    poses = decode_poses(g_params, GAN.generator, feats, jax.random.key(3), lengths)
    assert np.all(np.asarray(poses[1, 6:]) == 0.0)
    assert not np.all(np.asarray(poses[1, :6]) == 0.0)


def test_end_to_end_generate_from_waveform(rng):
    g_params = trained_params()
    model = Music2DanceModel(GAN, AUDIO, g_params)
    wave = rng.standard_normal(AUDIO.num_samples(1.0)).astype(np.float32)
    poses = model.generate(wave, seed=7)
    t = AUDIO.num_frames(len(wave))
    assert poses.shape == (t, LAYOUT.n_joints, LAYOUT.joint_dim)
    assert np.isfinite(poses).all()
    # determinism given seed
    np.testing.assert_array_equal(poses, model.generate(wave, seed=7))


def test_generate_batch_variable_lengths(rng):
    g_params = trained_params()
    model = Music2DanceModel(GAN, AUDIO, g_params)
    waves = [
        rng.standard_normal(AUDIO.num_samples(s)).astype(np.float32)
        for s in [0.5, 1.0, 0.75]
    ]
    outs = model.generate_batch(waves, seed=5)
    assert len(outs) == 3
    for w, p in zip(waves, outs):
        assert p.shape == (AUDIO.num_frames(len(w)), LAYOUT.n_joints, LAYOUT.joint_dim)
        assert np.isfinite(p).all()


def test_streaming_equals_full_decode():
    cfg = GeneratorConfig(
        layout=LAYOUT, feature_dim=AUDIO.n_mfcc, noise_dim=8, enc_dim=16,
        enc_layers=1, enc_kernel=1, hidden_dim=32, rnn_layers=1, head_hidden=16,
    )
    gen = Generator(cfg)
    feats = jax.random.normal(jax.random.key(0), (2, 12, AUDIO.n_mfcc))
    z = jax.random.normal(jax.random.key(1), (2, cfg.noise_dim))
    g_params = gen.init(jax.random.key(2), feats, z)

    full = gen.apply(g_params, feats, z).reshape(2, 12, LAYOUT.n_joints, LAYOUT.joint_dim)
    carry = gen.init_carry(2)
    chunks = []
    for i in range(0, 12, 4):
        out, carry = streaming_decode_step(
            g_params, cfg, feats[:, i : i + 4], z, carry
        )
        chunks.append(out)
    streamed = jnp.concatenate(chunks, axis=1)
    np.testing.assert_allclose(np.asarray(streamed), np.asarray(full), rtol=1e-5, atol=1e-5)
