"""End-to-end loop test: pipeline -> train -> checkpoint -> generate."""

import os

import jax
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.configs import preset
from music2dance_tpu.data.pipeline import SyntheticClipSource, make_dataset
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig
from music2dance_tpu.train.loop import train

AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def test_presets_resolve():
    for name in ("tiny", "full", "long"):
        p = preset(name)
        assert p.gan.generator.feature_dim == p.audio.n_features


def test_loop_trains_checkpoints_and_generates(tmp_path):
    gan = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    tc = TrainConfig(batch_size=4, clip_seconds=0.5, ckpt_every=2, log_every=2)
    src = SyntheticClipSource(8, 1.0, AUDIO, LAYOUT)
    ds = make_dataset(src, tc.batch_size, tc.clip_seconds, AUDIO, seed=0)

    ckpt_dir = str(tmp_path / "ckpt")
    log_dir = str(tmp_path / "logs")
    state = train(gan, tc, AUDIO, iter(ds), total_steps=4,
                  ckpt_dir=ckpt_dir, log_dir=log_dir)
    assert int(state.step) == 4
    assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        lines = f.readlines()
    assert len(lines) >= 1

    # resume from the checkpoint via the public inference API
    from music2dance_tpu.infer import Music2DanceModel

    model = Music2DanceModel.from_checkpoint(ckpt_dir)
    wave = np.random.default_rng(0).standard_normal(AUDIO.num_samples(0.5)).astype(np.float32)
    poses = model.generate(wave, seed=3)
    assert poses.shape == (AUDIO.num_frames(len(wave)), LAYOUT.n_joints, LAYOUT.joint_dim)


def test_loop_tbptt_mode(tmp_path):
    gan = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    tc = TrainConfig(batch_size=2, clip_seconds=1.0, tbptt_window=10, log_every=1)
    src = SyntheticClipSource(4, 2.0, AUDIO, LAYOUT)
    ds = make_dataset(src, tc.batch_size, tc.clip_seconds, AUDIO, seed=0)
    state = train(gan, tc, AUDIO, iter(ds), total_steps=2)
    assert int(state.step) == 2


def test_loop_dp_mode():
    from music2dance_tpu.parallel import make_mesh

    gan = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    tc = TrainConfig(batch_size=8, clip_seconds=0.5)
    src = SyntheticClipSource(8, 1.0, AUDIO, LAYOUT)
    ds = make_dataset(src, tc.batch_size, tc.clip_seconds, AUDIO, seed=0)
    state = train(gan, tc, AUDIO, iter(ds), total_steps=2, mesh=make_mesh(4))
    assert int(state.step) == 2
