"""Preprocess-time feature cache tests (data/cache.py)."""

import numpy as np

from music2dance_tpu.audio import AudioConfig, extract_features
from music2dance_tpu.data.cache import (
    PrecomputedFeatureSource,
    SliceFeatureClip,
    make_feature_dataset,
)
from music2dance_tpu.data.pipeline import DevicePrefetcher, SyntheticClipSource
from music2dance_tpu.models import JointLayout

AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def test_precompute_matches_direct_extraction():
    src = SyntheticClipSource(5, 1.0, AUDIO, LAYOUT, seed=1)
    pre = PrecomputedFeatureSource(src, AUDIO, batch_size=2, frontend_impl="xla")
    assert len(pre) == 5
    for i in range(5):
        clip = src[i]
        direct = np.asarray(extract_features(clip["wave"][None], AUDIO))[0]
        cached = pre[i]
        t = cached["feats"].shape[0]
        np.testing.assert_allclose(cached["feats"], direct[:t], rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(cached["pose"], clip["pose"][:t])


def test_disk_cache_round_trip(tmp_path):
    src = SyntheticClipSource(3, 0.5, AUDIO, LAYOUT, seed=2)
    cache = str(tmp_path / "feats")
    a = PrecomputedFeatureSource(src, AUDIO, frontend_impl="xla", cache_dir=cache)
    b = PrecomputedFeatureSource(src, AUDIO, frontend_impl="xla", cache_dir=cache)
    assert len(a) == len(b) == 3
    for i in range(3):
        np.testing.assert_array_equal(a[i]["feats"], b[i]["feats"])
        np.testing.assert_array_equal(a[i]["pose"], b[i]["pose"])


def test_slice_feature_clip():
    src = SyntheticClipSource(1, 1.0, AUDIO, LAYOUT)
    pre = PrecomputedFeatureSource(src, AUDIO, frontend_impl="xla")
    out = SliceFeatureClip(0.5, AUDIO).random_map(pre[0], np.random.default_rng(0))
    n = int(round(0.5 * AUDIO.feature_rate))
    assert out["feats"].shape == (n, AUDIO.n_mfcc)
    assert out["poses"].shape == (n, LAYOUT.pose_dim)


def test_feature_dataset_through_prefetcher():
    src = SyntheticClipSource(8, 1.0, AUDIO, LAYOUT)
    ds = make_feature_dataset(src, 4, 0.5, AUDIO, seed=0, frontend_impl="xla")
    pf = DevicePrefetcher(iter(ds), AUDIO, depth=2)
    n = int(round(0.5 * AUDIO.feature_rate))
    for _ in range(3):
        b = next(pf)
        assert b["feats"].shape == (4, n, AUDIO.n_mfcc)
        assert b["poses"].shape == (4, n, LAYOUT.pose_dim)
        assert np.isfinite(np.asarray(b["feats"])).all()


def test_feature_dataset_trains():
    import jax
    from music2dance_tpu.models import tiny_gan
    from music2dance_tpu.train import TrainConfig
    from music2dance_tpu.train.loop import train

    gan = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    tc = TrainConfig(batch_size=4, clip_seconds=0.5)
    src = SyntheticClipSource(8, 1.0, AUDIO, LAYOUT)
    ds = make_feature_dataset(src, 4, 0.5, AUDIO, seed=0, frontend_impl="xla")
    state = train(gan, tc, AUDIO, iter(ds), total_steps=2)
    assert int(state.step) == 2


def test_stale_cache_rejected(tmp_path):
    """A cache built under a different audio config or corpus must refuse
    to load (round-1 advisor finding: silent stale-cache reuse)."""
    import dataclasses

    import pytest

    from music2dance_tpu.data.cache import PrecomputedFeatureSource

    src = SyntheticClipSource(4, 0.5, AUDIO, LAYOUT)
    cache = str(tmp_path / "cache")
    PrecomputedFeatureSource(src, AUDIO, cache_dir=cache)  # builds + manifest

    # same config + corpus: loads fine
    PrecomputedFeatureSource(src, AUDIO, cache_dir=cache)

    # different audio config: rejected
    other = dataclasses.replace(AUDIO, n_mfcc=7)
    with pytest.raises(ValueError, match="different"):
        PrecomputedFeatureSource(src, other, cache_dir=cache)

    # different corpus size: rejected
    bigger = SyntheticClipSource(6, 0.5, AUDIO, LAYOUT)
    with pytest.raises(ValueError, match="different"):
        PrecomputedFeatureSource(bigger, AUDIO, cache_dir=cache)

    # manifest-less cache: rejected
    import os
    os.remove(os.path.join(cache, "manifest.json"))
    with pytest.raises(ValueError, match="manifest"):
        PrecomputedFeatureSource(src, AUDIO, cache_dir=cache)
