"""Data pipeline tests: grain sources, clip slicing, device prefetch."""

import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.pipeline import (
    DevicePrefetcher,
    NpzClipSource,
    SliceClip,
    SyntheticClipSource,
    WavPoseSource,
    make_dataset,
)
from music2dance_tpu.data.wav import save_wav
from music2dance_tpu.models import JointLayout

AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def test_synthetic_source_deterministic():
    src = SyntheticClipSource(10, 1.0, AUDIO, LAYOUT, seed=3)
    a, b = src[4], src[4]
    np.testing.assert_array_equal(a["wave"], b["wave"])
    np.testing.assert_array_equal(a["pose"], b["pose"])
    assert a["wave"].shape == (AUDIO.num_samples(1.0),)
    assert a["pose"].shape == (AUDIO.num_frames(len(a["wave"])), LAYOUT.pose_dim)


def test_slice_clip_alignment():
    src = SyntheticClipSource(1, 2.0, AUDIO, LAYOUT)
    clip = src[0]
    slicer = SliceClip(0.5, AUDIO)
    out = slicer.random_map(clip, np.random.default_rng(0))
    n_frames = int(round(0.5 * AUDIO.feature_rate))
    assert out["pose"].shape == (n_frames, LAYOUT.pose_dim)
    assert len(out["wave"]) == n_frames * AUDIO.hop_length


def test_slice_clip_short_input_tiles():
    src = SyntheticClipSource(1, 0.25, AUDIO, LAYOUT)
    slicer = SliceClip(1.0, AUDIO)
    out = slicer.random_map(src[0], np.random.default_rng(0))
    n_frames = int(round(1.0 * AUDIO.feature_rate))
    assert out["pose"].shape[0] == n_frames


def test_dataset_batches():
    src = SyntheticClipSource(16, 1.0, AUDIO, LAYOUT)
    ds = make_dataset(src, batch_size=4, clip_seconds=0.5, audio=AUDIO, seed=0)
    it = iter(ds)
    n_frames = int(round(0.5 * AUDIO.feature_rate))
    for _ in range(3):
        b = next(it)
        assert b["wave"].shape == (4, n_frames * AUDIO.hop_length)
        assert b["pose"].shape == (4, n_frames, LAYOUT.pose_dim)


def test_device_prefetcher_yields_feature_batches():
    src = SyntheticClipSource(16, 1.0, AUDIO, LAYOUT)
    ds = make_dataset(src, batch_size=4, clip_seconds=0.5, audio=AUDIO, seed=0)
    pf = DevicePrefetcher(iter(ds), AUDIO, depth=2)
    n_frames = int(round(0.5 * AUDIO.feature_rate))
    for _ in range(3):
        b = next(pf)
        assert b["feats"].shape == (4, n_frames, AUDIO.n_mfcc)
        assert b["poses"].shape == (4, n_frames, LAYOUT.pose_dim)
        assert np.isfinite(np.asarray(b["feats"])).all()


def test_npz_source(tmp_path):
    for i in range(3):
        np.savez(
            tmp_path / f"clip{i}.npz",
            wave=np.random.default_rng(i).standard_normal(800).astype(np.float32),
            pose=np.zeros((4, LAYOUT.pose_dim), np.float32),
        )
    src = NpzClipSource(str(tmp_path))
    assert len(src) == 3
    clip = src[1]
    assert clip["wave"].shape == (800,)
    assert clip["pose"].shape == (4, LAYOUT.pose_dim)

    with pytest.raises(FileNotFoundError):
        NpzClipSource(str(tmp_path / "empty_nothing"))


def test_wav_pose_source(tmp_path):
    rng = np.random.default_rng(0)
    for i in range(2):
        wave = rng.standard_normal(AUDIO.num_samples(0.5)).astype(np.float32) * 0.3
        save_wav(str(tmp_path / f"song{i}.wav"), wave, AUDIO.sample_rate)
        t = AUDIO.num_frames(len(wave))
        np.save(tmp_path / f"song{i}.npy",
                rng.standard_normal((t, LAYOUT.n_joints, LAYOUT.joint_dim)).astype(np.float32))
    src = WavPoseSource(str(tmp_path))
    assert len(src) == 2
    clip = src[0]
    assert clip["wave"].ndim == 1
    assert clip["pose"].shape[1] == LAYOUT.pose_dim


def test_grain_iterator_state_round_trip():
    """grain DatasetIterator checkpointing: a fresh iterator restored to a
    saved state continues with exactly the same batches."""
    src = SyntheticClipSource(8, 0.5, AUDIO, LAYOUT)
    ds = make_dataset(src, 2, 0.5, AUDIO, seed=0)
    it1 = iter(ds)
    for _ in range(3):
        next(it1)
    state = it1.get_state()
    a = next(it1)

    it2 = iter(ds)
    it2.set_state(state)
    b = next(it2)
    np.testing.assert_array_equal(a["wave"], b["wave"])
    np.testing.assert_array_equal(a["pose"], b["pose"])


def test_train_loop_writes_and_restores_data_state(tmp_path):
    """The loop saves data_state.json at checkpoint time; restore_data_state
    applies it to a fresh iterator."""
    import json
    import os

    from music2dance_tpu.models import tiny_gan
    from music2dance_tpu.train import TrainConfig, init_state
    from music2dance_tpu.train.loop import restore_data_state, train

    gan = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    tc = TrainConfig(batch_size=2, ckpt_every=2, log_every=2)
    src = SyntheticClipSource(8, 0.5, AUDIO, LAYOUT)
    ds = make_dataset(src, 2, 0.5, AUDIO, seed=0)
    ckpt = str(tmp_path / "ckpt")
    train(gan, tc, AUDIO, iter(ds), total_steps=2, ckpt_dir=ckpt)
    path = os.path.join(ckpt, "data_state.json")
    assert os.path.exists(path)
    saved = json.load(open(path))

    it = restore_data_state(ckpt, iter(ds))
    assert it.get_state() == saved


def test_beat_source_deterministic_and_dataset_compatible():
    from music2dance_tpu.data.pipeline import BeatClipSource

    src = BeatClipSource(6, 1.0, AUDIO, LAYOUT, seed=3)
    a, b = src[2], BeatClipSource(6, 1.0, AUDIO, LAYOUT, seed=3)[2]
    np.testing.assert_array_equal(a["wave"], b["wave"])
    np.testing.assert_array_equal(a["pose"], b["pose"])
    assert a["wave"].dtype == np.float32 and a["pose"].dtype == np.float32
    t = AUDIO.num_frames(AUDIO.num_samples(1.0))
    assert a["pose"].shape == (t, LAYOUT.pose_dim)
    ds = make_dataset(src, 2, 0.5, AUDIO, seed=0)
    batch = next(iter(ds))
    assert batch["wave"].shape[0] == 2
