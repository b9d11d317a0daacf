"""Device-resident feature store + on-device-sampled train step."""

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.device_store import DeviceFeatureStore
from music2dance_tpu.data.pipeline import SyntheticClipSource
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state
from music2dance_tpu.train.sampled import (
    make_sampling_train_step,
    shard_sampling_train_step,
)

AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
LAYOUT = JointLayout(n_joints=5, joint_dim=3)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def make_store(n_clips=6, seconds=1.0):
    src = SyntheticClipSource(n_clips, seconds, AUDIO, LAYOUT, seed=0)
    return DeviceFeatureStore.from_source(src, AUDIO, frontend_impl="xla")


def test_store_shapes_and_lengths():
    store = make_store()
    assert store.n_clips == 6
    t = AUDIO.num_frames(AUDIO.num_samples(1.0))
    assert store.feats.shape == (6, t, AUDIO.n_mfcc)
    assert store.poses.shape == (6, t, LAYOUT.pose_dim)
    assert np.all(np.asarray(store.lengths) == t)


def test_sample_windows_are_valid():
    store = make_store()
    n = 10
    batch = jax.jit(lambda k: store.sample(k, 8, n))(jax.random.key(1))
    assert batch["feats"].shape == (8, n, AUDIO.n_mfcc)
    assert batch["poses"].shape == (8, n, LAYOUT.pose_dim)
    assert np.isfinite(np.asarray(batch["feats"])).all()
    # windows come from real data, not padding: no all-zero rows
    assert not np.any(np.all(np.asarray(batch["poses"]) == 0.0, axis=(1, 2)))


def test_sample_is_deterministic_and_key_sensitive():
    store = make_store()
    a = store.sample(jax.random.key(2), 4, 8)
    b = store.sample(jax.random.key(2), 4, 8)
    c = store.sample(jax.random.key(3), 4, 8)
    np.testing.assert_array_equal(np.asarray(a["feats"]), np.asarray(b["feats"]))
    assert not np.allclose(np.asarray(a["feats"]), np.asarray(c["feats"]))


def test_sampling_train_step():
    store = make_store()
    tc = TrainConfig(batch_size=4)
    n = 10
    sample = store.sample(jax.random.key(0), 4, n)
    state = init_state(jax.random.key(1), GAN, tc, sample)
    step = jax.jit(make_sampling_train_step(GAN, tc, store, n))
    for _ in range(3):
        state, metrics = step(state)
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))


def test_sharded_sampling_train_step():
    from music2dance_tpu.parallel import make_mesh

    store = make_store()
    tc = TrainConfig(batch_size=8)  # GLOBAL batch: 2 per shard on 4 devices
    n = 10
    sample = store.sample(jax.random.key(0), 2, n)
    state = init_state(jax.random.key(1), GAN, tc, sample)
    mesh = make_mesh(4)
    step = shard_sampling_train_step(GAN, tc, store, n, mesh, donate=False)
    state, metrics = step(state)
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["d_loss"]))


def test_train_from_store_loop(tmp_path):
    from music2dance_tpu.train.loop import train_from_store

    store = make_store()
    tc = TrainConfig(batch_size=4, clip_seconds=10 / AUDIO.feature_rate,
                     log_every=2, ckpt_every=4)
    state = train_from_store(
        GAN, tc, AUDIO, store, total_steps=4,
        ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"),
    )
    assert int(state.step) == 4
    import os
    assert os.path.exists(tmp_path / "logs" / "metrics.jsonl")


def test_train_from_store_dp():
    from music2dance_tpu.parallel import make_mesh
    from music2dance_tpu.train.loop import train_from_store

    store = make_store()
    tc = TrainConfig(batch_size=8, clip_seconds=10 / AUDIO.feature_rate, log_every=2)
    state = train_from_store(GAN, tc, AUDIO, store, total_steps=2, mesh=make_mesh(4))
    assert int(state.step) == 2


def test_sampling_global_batch_semantics():
    """tc.batch_size is the global batch in all input modes (round-1
    advisor finding): indivisible shard counts are rejected."""
    import pytest

    from music2dance_tpu.train.sampled import make_sampling_train_step

    store = make_store()
    tc = TrainConfig(batch_size=6)
    with pytest.raises(ValueError):
        make_sampling_train_step(GAN, tc, store, 10, axis_name="data", num_shards=4)


def test_train_from_store_resume_continues_numbering(tmp_path):
    """``total_steps`` is the ABSOLUTE target: a restored run continues
    its step numbering instead of restarting at 0 (which used to
    overwrite the checkpoint history and interleave stale JSONL rows)."""
    import json
    import os

    from music2dance_tpu.ckpt.orbax_io import restore_bundle
    from music2dance_tpu.train.loop import train_from_store

    store = make_store()
    tc = TrainConfig(batch_size=4, clip_seconds=10 / AUDIO.feature_rate,
                     log_every=2, ckpt_every=2)
    ckpt, logs = str(tmp_path / "ckpt"), str(tmp_path / "logs")
    state = train_from_store(GAN, tc, AUDIO, store, total_steps=4,
                             ckpt_dir=ckpt, log_dir=logs)
    assert int(state.step) == 4

    _, _, restored = restore_bundle(ckpt)
    assert int(restored.step) == 4
    state2 = train_from_store(GAN, tc, AUDIO, store, total_steps=8,
                              ckpt_dir=ckpt, log_dir=logs, state=restored)
    assert int(state2.step) == 8

    rows = [json.loads(l) for l in open(os.path.join(logs, "metrics.jsonl"))]
    steps = [r["step"] for r in rows if "steps_per_sec" in r]
    assert steps == [2, 4, 6, 8], steps
    saved = sorted(int(s) for s in os.listdir(os.path.join(ckpt, "steps")))
    assert 8 in saved

    # a target the state has already reached is a loud no-op
    state3 = train_from_store(GAN, tc, AUDIO, store, total_steps=8,
                              state=state2)
    assert int(state3.step) == 8


def test_streamed_train_resume_continues_numbering(tmp_path):
    """Same absolute-target semantics for the streamed loop."""
    import json
    import os

    from music2dance_tpu.data.pipeline import SyntheticClipSource, make_dataset
    from music2dance_tpu.train.loop import train

    src = SyntheticClipSource(6, 1.0, AUDIO, LAYOUT, seed=0)
    tc = TrainConfig(batch_size=4, clip_seconds=10 / AUDIO.feature_rate,
                     log_every=2, ckpt_every=4)
    logs = str(tmp_path / "logs")

    def ds():
        return iter(make_dataset(src, tc.batch_size, tc.clip_seconds, AUDIO,
                                 seed=0))

    state = train(GAN, tc, AUDIO, ds(), total_steps=4, log_dir=logs)
    assert int(state.step) == 4
    state2 = train(GAN, tc, AUDIO, ds(), total_steps=8, log_dir=logs,
                   state=state)
    assert int(state2.step) == 8
    rows = [json.loads(l) for l in open(os.path.join(logs, "metrics.jsonl"))]
    steps = [r["step"] for r in rows if "d_loss" in r]
    # the StepTimer logs on its own wall-clock-aware cadence; what the
    # resume contract pins is MONOTONIC ABSOLUTE numbering across the
    # two runs — the second run's rows continue past 4, never restart
    assert steps == sorted(steps), steps
    assert steps[-1] > 4 and steps[-1] <= 8, steps
