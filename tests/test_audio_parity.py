"""Frontend parity vs the numpy oracle at rtol 1e-4 [BASELINE tolerance].

Covers the canonical clip lengths (3 s / 6 s) and batch shapes, plus
hypothesis-generated waveforms and non-default configs (SURVEY.md §4.1).
"""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from music2dance_tpu.audio import AudioConfig, extract_features
from music2dance_tpu.audio.frontend import melspectrogram, mfcc, stft_power
from tests import oracle_audio as oracle

# Small-FFT config keeps the oracle's python loops fast in CI.
FAST = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200, n_mels=40, n_mfcc=13)


def make_wave(rng, seconds, cfg, kind="mix"):
    n = cfg.num_samples(seconds)
    t = np.arange(n) / cfg.sample_rate
    if kind == "mix":
        y = (
            0.5 * np.sin(2 * np.pi * 440.0 * t)
            + 0.2 * np.sin(2 * np.pi * 130.8 * t + 0.3)
            + 0.1 * rng.standard_normal(n)
        )
    elif kind == "noise":
        y = rng.standard_normal(n)
    else:
        y = np.zeros(n)
    return y.astype(np.float32)


def assert_close(ours, ref, rtol=1e-4, atol=1e-3, what=""):
    ours = np.asarray(ours, dtype=np.float64)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=atol, err_msg=what)


@pytest.mark.parametrize("seconds", [0.5, 1.0])
@pytest.mark.parametrize("kind", ["mix", "noise"])
def test_stft_power_parity(rng, seconds, kind):
    cfg = FAST
    y = make_wave(rng, seconds, cfg, kind)
    ref = oracle.oracle_stft_power(y, cfg)
    ours = stft_power(jnp.asarray(y)[None], cfg)[0]
    assert ours.shape == ref.shape == (cfg.num_frames(len(y)), cfg.n_freqs)
    # power spans many orders of magnitude; tolerance relative to peak
    assert_close(ours, ref, rtol=1e-4, atol=1e-4 * ref.max(), what="stft power")


def test_mel_filterbank_parity():
    from music2dance_tpu.audio.filters import mel_filterbank

    for cfg in [FAST, AudioConfig(), AudioConfig(htk=True), AudioConfig(fmin=55.0, fmax=8000.0)]:
        ref = oracle.oracle_mel_filterbank(cfg)
        ours = mel_filterbank(cfg)
        np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_dct_matrix_matches_scipy():
    import scipy.fft
    from music2dance_tpu.audio.filters import dct_matrix

    x = np.random.default_rng(1).standard_normal((7, 40))
    d = dct_matrix(13, 40)
    ref = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)[:, :13]
    np.testing.assert_allclose(x @ d.T, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("seconds", [0.5, 1.5])
def test_melspectrogram_parity(rng, seconds):
    cfg = FAST
    y = make_wave(rng, seconds, cfg)
    ref = oracle.oracle_melspectrogram(y, cfg)
    ours = melspectrogram(jnp.asarray(y)[None], cfg)[0]
    assert_close(ours, ref, atol=1e-4 * ref.max(), what="melspectrogram")


@pytest.mark.parametrize("seconds", [0.5, 1.5])
def test_mfcc_parity(rng, seconds):
    cfg = FAST
    y = make_wave(rng, seconds, cfg)
    ref = oracle.oracle_mfcc(y, cfg)
    ours = mfcc(jnp.asarray(y)[None], cfg)[0]
    assert_close(ours, ref, what="mfcc")


def test_full_features_parity_batched(rng):
    cfg = FAST
    secs = 1.0
    batch = np.stack([make_wave(rng, secs, cfg, k) for k in ["mix", "noise", "mix"]])
    ref = np.stack([oracle.oracle_features(w, cfg) for w in batch])
    ours = extract_features(jnp.asarray(batch), cfg)
    assert ours.shape == ref.shape
    assert_close(ours, ref, what="normalized features")


def test_logmel_feature_type(rng):
    cfg = AudioConfig(
        sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
        n_mels=40, feature_type="logmel",
    )
    y = make_wave(rng, 1.0, cfg)
    ref = oracle.oracle_features(y, cfg)
    ours = extract_features(jnp.asarray(y), cfg)
    assert ours.shape == (cfg.num_frames(len(y)), cfg.n_mels)
    assert_close(ours, ref, what="logmel features")


def test_default_config_canonical_clips(rng):
    """Full default config (n_fft=1024, 30 Hz feature rate) on a 3 s clip."""
    cfg = AudioConfig()
    y = make_wave(rng, 3.0, cfg)
    ref = oracle.oracle_features(y, cfg)
    ours = extract_features(jnp.asarray(y), cfg)
    assert ours.shape[0] == cfg.num_frames(len(y)) == 91  # 1 + 3s*30Hz
    assert_close(ours, ref, what="default-config features")


def test_win_length_lt_nfft(rng):
    cfg = AudioConfig(
        sample_rate=8000, n_fft=256, win_length=192, hop_length=200,
        n_mels=40, n_mfcc=13,
    )
    y = make_wave(rng, 1.0, cfg)
    ref = oracle.oracle_mfcc(y, cfg)
    ours = mfcc(jnp.asarray(y)[None], cfg)[0]
    assert_close(ours, ref, what="mfcc win_length<n_fft")


@settings(max_examples=10, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    nsamp=st.integers(1600, 6400),
    scale=st.floats(1e-3, 10.0),
)
def test_hypothesis_waveforms(seed, nsamp, scale):
    cfg = FAST
    y = (np.random.default_rng(seed).standard_normal(nsamp) * scale).astype(np.float32)
    ref = oracle.oracle_features(y, cfg)
    ours = extract_features(jnp.asarray(y), cfg)
    assert_close(ours, ref, what=f"hypothesis seed={seed}")


def test_silence_is_finite():
    cfg = FAST
    y = np.zeros(cfg.num_samples(1.0), dtype=np.float32)
    feats = extract_features(jnp.asarray(y), cfg)
    assert np.isfinite(np.asarray(feats)).all()


def test_masked_batch_extraction_matches_per_song(rng):
    """pad_and_extract_batch over mixed-length songs == per-song
    extract_features on every valid frame (incl. the last frame, which
    naive zero-padded batching corrupts)."""
    import jax.numpy as jnp

    from music2dance_tpu.audio.frontend import (
        extract_features,
        pad_and_extract_batch,
    )

    cfg = FAST
    waves = [
        make_wave(rng, s, cfg, kind)
        for s, kind in [(1.0, "mix"), (0.63, "noise"), (0.35, "mix")]
    ]
    feats, t_valid = pad_and_extract_batch(waves, cfg)
    feats = np.asarray(feats)
    for i, w in enumerate(waves):
        ref = np.asarray(extract_features(jnp.asarray(w), cfg))
        assert t_valid[i] == ref.shape[0]
        np.testing.assert_allclose(
            feats[i, : t_valid[i]], ref, rtol=2e-5, atol=2e-5,
            err_msg=f"song {i}",
        )
        np.testing.assert_array_equal(feats[i, t_valid[i]:], 0.0)


def test_pcm16_batch_path_bit_identical(rng):
    """All-int16 batches ship as int16 and dequantize on device; the
    features must be BIT-identical to the f32 host-dequantized path
    (int16 -> f32 and /32768 are both exact). Mixed batches fall back to
    f32 with correct host dequantization of the int16 members."""
    from music2dance_tpu.audio.frontend import pad_and_extract_batch

    cfg = FAST
    f32_waves = [
        np.round(make_wave(rng, s, cfg, "mix") * 32767.0) / 32768.0
        for s in (0.8, 0.5)
    ]
    i16_waves = [(w * 32768.0).astype(np.int16) for w in f32_waves]

    ref, t_ref = pad_and_extract_batch(f32_waves, cfg)
    out, t_out = pad_and_extract_batch(i16_waves, cfg)
    np.testing.assert_array_equal(np.asarray(t_out), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    mixed, t_mix = pad_and_extract_batch([i16_waves[0], f32_waves[1]], cfg)
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(t_mix), np.asarray(t_ref))
