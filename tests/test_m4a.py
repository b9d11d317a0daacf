"""M4A/AAC decode path (system libav shim — data/m4a.py).

Round-trips use the shim's own test-only AAC encoder: unlike the MP3/Ogg
suites (independent encoder/decoder codebases) both directions here ride
libav, so these tests prove the BINDING and the loader wiring — buffer
ownership, mixdown, sniff routing, error paths — not libav's DSP. The
cross-implementation anchor is test_m4a_matches_wav_rendition, which
checks an AAC encode of a WAV decoded by this package's own from-scratch
decoder against the original samples.
"""

import numpy as np
import pytest

from music2dance_tpu.data.m4a import (avdec_available, encode_m4a_for_tests,
                                      load_m4a)
from music2dance_tpu.data.wav import SUPPORTED_EXTENSIONS, load_wav

from tests.test_codecs import aligned_corr, noise_signal

needs_avdec = pytest.mark.skipif(not avdec_available(), reason="libav absent")


@needs_avdec
def test_m4a_roundtrip_mono(tmp_path):
    sr = 22050
    x = noise_signal(sr)
    p = str(tmp_path / "m.m4a")
    encode_m4a_for_tests(p, x, sr)
    y, sr2 = load_m4a(p)
    assert sr2 == sr
    # mp4 edit lists record the encoder delay; libav trims it on decode,
    # so the signal comes back aligned (aligned_corr double-checks).
    assert len(y) >= len(x) - 1024
    assert aligned_corr(y, x) > 0.97


@needs_avdec
@pytest.mark.parametrize("sr", [16000, 44100])
def test_m4a_rate_preserved(tmp_path, sr):
    x = noise_signal(sr, seconds=1.0)
    p = str(tmp_path / "m.m4a")
    encode_m4a_for_tests(p, x, sr)
    y, sr2 = load_m4a(p)
    assert sr2 == sr
    assert aligned_corr(y, x) > 0.95


@needs_avdec
def test_m4a_stereo_mixdown(tmp_path):
    sr = 22050
    left = noise_signal(sr, seed=1)
    right = noise_signal(sr, seed=2)
    p = str(tmp_path / "s.m4a")
    encode_m4a_for_tests(p, np.stack([left, right], axis=1), sr)
    y, sr2 = load_m4a(p)
    assert sr2 == sr
    assert aligned_corr(y, 0.5 * (left + right)) > 0.95


@needs_avdec
def test_load_wav_dispatch_m4a(tmp_path):
    """ftyp sniffing routes .m4a through the libav shim, then the shared
    resample path (librosa.load(sr=...) semantics)."""
    sr = 44100
    x = noise_signal(sr, seconds=1.0)
    # extension deliberately wrong: routing is by magic bytes
    p = str(tmp_path / "song.dat")
    encode_m4a_for_tests(p, x, sr)
    y, sr2 = load_wav(p, target_sr=22050)
    assert sr2 == 22050
    assert abs(len(y) - len(x) // 2) < 2048


@needs_avdec
def test_corrupt_m4a_fails_loudly(tmp_path):
    p = tmp_path / "bad.m4a"
    p.write_bytes(b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 72)
    with pytest.raises(ValueError, match="cannot decode"):
        load_wav(str(p))


@needs_avdec
def test_m4a_matches_wav_rendition(tmp_path):
    """The same signal through WAV (from-scratch decoder) and AAC (libav)
    must agree — a cross-decoder check in the spirit of the house_lo
    three-way in tests/test_codecs.py."""
    from music2dance_tpu.data.wav import save_wav

    sr = 22050
    x = noise_signal(sr)
    wav_p, m4a_p = str(tmp_path / "a.wav"), str(tmp_path / "a.m4a")
    save_wav(wav_p, x, sr)
    w, _ = load_wav(wav_p)
    encode_m4a_for_tests(m4a_p, w, sr)
    m, _ = load_wav(m4a_p)
    assert aligned_corr(m, w) > 0.97


@needs_avdec
def test_pipeline_pairs_m4a(tmp_path):
    from music2dance_tpu.data.pipeline import WavPoseSource

    sr = 22050
    x = noise_signal(sr, seconds=1.0)
    encode_m4a_for_tests(str(tmp_path / "song.m4a"), x, sr)
    frames = int(np.ceil(len(x) / 735)) + 1
    np.save(str(tmp_path / "song.npy"), np.zeros((frames, 23, 3), np.float32))
    src = WavPoseSource(str(tmp_path), target_sr=sr)
    assert len(src) == 1
    item = src[0]
    assert item["wave"].ndim == 1 and len(item["wave"]) >= len(x) - 1024


def test_supported_extensions_cover_m4a():
    assert ".m4a" in SUPPORTED_EXTENSIONS
    assert ".mp4" in SUPPORTED_EXTENSIONS


def test_m4a_unavailable_names_format(tmp_path, monkeypatch):
    """Without the shim, the loader's loud named-format error stands."""
    from music2dance_tpu.data import m4a as m4a_mod

    monkeypatch.setattr(m4a_mod, "avdec_available", lambda: False)
    p = tmp_path / "song.m4a"
    p.write_bytes(b"\x00\x00\x00\x20ftypM4A " + b"\x00" * 72)
    with pytest.raises(ValueError, match="M4A"):
        load_wav(str(p))
    with pytest.raises(ValueError, match="onvert"):
        load_wav(str(p))
