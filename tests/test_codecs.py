"""MP3 / Ogg Vorbis decode paths (system-codec bindings) + PCM8 WAV.

Round-trips encode with libmp3lame / libvorbisenc (independent codebases
from the decoders under test — see tests/codec_encoders.py) and
cross-checks the three pygame-shipped renditions of the same song
(house_lo.{wav,mp3,ogg}) against this package's own WAV decoder.
"""

import os

import numpy as np
import pytest

from music2dance_tpu.data import wav as wav_mod
from music2dance_tpu.data.mp3 import load_mp3, mp3_available
from music2dance_tpu.data.oggvorbis import load_ogg, vorbis_available
from music2dance_tpu.data.wav import load_wav, load_wav_numpy

from tests.codec_encoders import write_mp3, write_ogg

_PYGAME_DATA = "/opt/venv/lib/python3.12/site-packages/pygame/examples/data"

needs_mp3 = pytest.mark.skipif(not mp3_available(), reason="libmpg123 absent")
needs_vorbis = pytest.mark.skipif(
    not vorbis_available(), reason="libvorbisfile absent"
)


def noise_signal(sr, seconds=2.0, seed=0):
    """Band-limited noise: unambiguous under cross-correlation alignment
    (a pure sine would match at every period multiple)."""
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(int(sr * seconds))
    k = np.hanning(15)
    x = np.convolve(x, k / k.sum(), "same")
    return (0.6 * x / np.abs(x).max()).astype(np.float32)


def aligned_corr(decoded, original, probe=8192, search=16384):
    """Align ``decoded`` to ``original`` by cross-correlation (codec delay)
    and return their normalized correlation over the overlap."""
    c = np.correlate(decoded[: search + probe], original[:probe], "valid")
    off = int(np.argmax(np.abs(c)))
    n = min(len(decoded) - off, len(original))
    a, b = decoded[off : off + n], original[:n]
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


@needs_mp3
def test_mp3_roundtrip_mono(tmp_path):
    sr = 22050
    x = noise_signal(sr)
    p = str(tmp_path / "m.mp3")
    write_mp3(p, x, sr)
    y, sr2 = load_mp3(p)
    assert sr2 == sr
    assert len(y) >= len(x)  # codec delay pads the tail
    assert aligned_corr(y, x) > 0.97


@needs_mp3
@pytest.mark.parametrize("sr", [44100, 16000])
def test_mp3_rate_preserved(tmp_path, sr):
    x = noise_signal(sr, seconds=1.0)
    p = str(tmp_path / "m.mp3")
    write_mp3(p, x, sr)
    y, sr2 = load_mp3(p)
    assert sr2 == sr
    assert aligned_corr(y, x) > 0.97


@needs_mp3
def test_mp3_stereo_mixdown(tmp_path):
    sr = 22050
    left = noise_signal(sr, seed=1)
    right = noise_signal(sr, seed=2)
    p = str(tmp_path / "s.mp3")
    write_mp3(p, left, sr, right=right, brate=192)
    y, sr2 = load_mp3(p)
    assert sr2 == sr
    assert aligned_corr(y, 0.5 * (left + right)) > 0.95


@needs_vorbis
def test_ogg_roundtrip_mono(tmp_path):
    sr = 22050
    x = noise_signal(sr)
    p = str(tmp_path / "v.ogg")
    write_ogg(p, x, sr)
    y, sr2 = load_ogg(p)
    assert sr2 == sr
    # Vorbis is sample-exact in length and alignment (no encoder delay)
    assert len(y) == len(x)
    assert aligned_corr(y, x) > 0.97


@needs_vorbis
def test_ogg_stereo_mixdown(tmp_path):
    sr = 22050
    left = noise_signal(sr, seed=3)
    right = noise_signal(sr, seed=4)
    p = str(tmp_path / "s.ogg")
    write_ogg(p, left, sr, right=right, quality=0.8)
    y, sr2 = load_ogg(p)
    assert sr2 == sr
    assert aligned_corr(y, 0.5 * (left + right)) > 0.95


@needs_mp3
@needs_vorbis
@pytest.mark.skipif(
    not os.path.isdir(_PYGAME_DATA), reason="pygame example assets absent"
)
def test_house_lo_cross_format():
    """The same song shipped as 8-bit WAV, MP3 and Ogg must decode to the
    same waveform through three unrelated decode paths (our RIFF parser,
    mpg123, libvorbisfile)."""
    w, srw = load_wav(os.path.join(_PYGAME_DATA, "house_lo.wav"))
    m, srm = load_mp3(os.path.join(_PYGAME_DATA, "house_lo.mp3"))
    o, sro = load_ogg(os.path.join(_PYGAME_DATA, "house_lo.ogg"))
    assert srw == srm == sro
    assert aligned_corr(m, w) > 0.99
    assert aligned_corr(o, w) > 0.99


@needs_mp3
def test_load_wav_dispatch_mp3(tmp_path):
    sr = 22050
    x = noise_signal(sr, seconds=1.0)
    p = str(tmp_path / "dispatch.mp3")
    write_mp3(p, x, sr)
    y, sr2 = load_wav(p)
    assert sr2 == sr and aligned_corr(y, x) > 0.97
    # librosa.load(sr=...) semantics ride the same resampler as WAV input
    y16k, sr16k = load_wav(p, target_sr=16000)
    assert sr16k == 16000
    assert abs(len(y16k) - len(y) * 16000 / sr) <= 2


@needs_vorbis
def test_load_wav_dispatch_ogg(tmp_path):
    sr = 22050
    x = noise_signal(sr, seconds=1.0)
    p = str(tmp_path / "dispatch.ogg")
    write_ogg(p, x, sr)
    y, sr2 = load_wav(p)
    assert sr2 == sr and aligned_corr(y, x) > 0.97


def test_mp3_unavailable_names_format(tmp_path, monkeypatch):
    p = str(tmp_path / "x.mp3")
    with open(p, "wb") as f:
        f.write(b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\x00" * 64)
    monkeypatch.setattr("music2dance_tpu.data.mp3.mp3_available", lambda: False)
    with pytest.raises(ValueError, match="MP3.*libmpg123"):
        load_wav(p)


def test_ogg_unavailable_names_format(tmp_path, monkeypatch):
    p = str(tmp_path / "x.ogg")
    with open(p, "wb") as f:
        f.write(b"OggS" + b"\x00" * 64)
    monkeypatch.setattr(
        "music2dance_tpu.data.oggvorbis.vorbis_available", lambda: False
    )
    with pytest.raises(ValueError, match="Ogg.*libvorbisfile"):
        load_wav(p)


@needs_vorbis
def test_ogg_without_vorbis_stream_fails_loudly(tmp_path):
    p = str(tmp_path / "opus_like.ogg")
    with open(p, "wb") as f:  # an Ogg page that carries no Vorbis stream
        f.write(b"OggS\x00\x02" + b"\x00" * 20 + b"\x01\x08" + b"garbage!")
    with pytest.raises(ValueError, match="Ogg Vorbis"):
        load_ogg(p)


@needs_mp3
def test_truncated_mp3_decodes_prefix(tmp_path):
    sr = 22050
    x = noise_signal(sr)
    p = str(tmp_path / "full.mp3")
    write_mp3(p, x, sr)
    data = open(p, "rb").read()
    q = str(tmp_path / "half.mp3")
    with open(q, "wb") as f:
        f.write(data[: len(data) // 2])
    y, sr2 = load_mp3(q)  # mpg123 resyncs and yields the intact prefix
    assert sr2 == sr
    assert 0 < len(y) < len(x)


def test_pcm8_wav_roundtrip(tmp_path):
    """8-bit WAV (unsigned, 128-bias) decodes on both the numpy and native
    paths, bit-identically."""
    sr = 11025
    x = noise_signal(sr, seconds=0.5)
    u8 = np.clip(np.round(x * 128.0 + 128.0), 0, 255).astype(np.uint8)
    body = u8.tobytes()
    hdr = (
        b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sr.to_bytes(4, "little") + sr.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
        + b"data" + len(body).to_bytes(4, "little")
    )
    p = str(tmp_path / "u8.wav")
    with open(p, "wb") as f:
        f.write(hdr + body)
    y, sr2 = load_wav_numpy(p)
    assert sr2 == sr
    np.testing.assert_allclose(y, (u8.astype(np.float32) - 128.0) / 128.0)
    assert np.max(np.abs(y - x)) < (1.0 / 128.0)  # quantization bound
    if wav_mod.ensure_native() is not None:
        yn, srn = wav_mod.load_wav_native(p)
        assert srn == sr
        np.testing.assert_array_equal(y, yn)


@needs_mp3
def test_pipeline_pairs_mp3(tmp_path):
    from music2dance_tpu.data.pipeline import WavPoseSource

    sr = 22050
    x = noise_signal(sr, seconds=1.0)
    write_mp3(str(tmp_path / "song.mp3"), x, sr)
    frames = int(np.ceil(len(x) / 735)) + 1
    np.save(str(tmp_path / "song.npy"), np.zeros((frames, 23, 3), np.float32))
    src = WavPoseSource(str(tmp_path), target_sr=sr)
    assert len(src) == 1
    item = src[0]
    assert item["wave"].ndim == 1 and len(item["wave"]) >= len(x)


@needs_vorbis
def test_chained_ogg_same_format_decodes_both_links(tmp_path):
    """Chained Ogg (concatenated encodes, distinct serials): same-format
    links decode seamlessly to the combined length."""
    sr = 22050
    a = noise_signal(sr, seconds=0.5, seed=8)
    b = noise_signal(sr, seconds=0.5, seed=9)
    p1, p2 = str(tmp_path / "a.ogg"), str(tmp_path / "b.ogg")
    write_ogg(p1, a, sr, serial=101)
    write_ogg(p2, b, sr, serial=202)
    chained = str(tmp_path / "chain.ogg")
    with open(chained, "wb") as f:
        f.write(open(p1, "rb").read() + open(p2, "rb").read())
    y, sr2 = load_ogg(chained)
    assert sr2 == sr
    assert len(y) == len(a) + len(b)
    assert aligned_corr(y[: len(a)], a) > 0.97
    assert aligned_corr(y[len(a):], b) > 0.97


@needs_vorbis
def test_chained_ogg_format_change_rejected(tmp_path):
    """A later link changing the sample rate must fail loudly, not
    silently concatenate wrong-tempo samples (or walk invalid channel
    pointers on a channel-count change)."""
    sr = 22050
    a = noise_signal(sr, seconds=0.5, seed=8)
    b = noise_signal(11025, seconds=0.5, seed=9)
    p1, p2 = str(tmp_path / "a.ogg"), str(tmp_path / "b.ogg")
    write_ogg(p1, a, sr, serial=101)
    write_ogg(p2, b, 11025, serial=202)
    chained = str(tmp_path / "chain.ogg")
    with open(chained, "wb") as f:
        f.write(open(p1, "rb").read() + open(p2, "rb").read())
    with pytest.raises(ValueError, match="chained Ogg stream changes format"):
        load_ogg(chained)


def test_sniff_rejects_raw_pcm_sync_lookalike():
    """int16 PCM starting at sample -1 begins FF FF — a sync-only MPEG
    test would misroute it (the serving layer sniffs request bodies)."""
    from music2dance_tpu.data.wav import _sniff_container

    assert _sniff_container(b"\xff\xff\xff\xff" + b"\x00" * 8) == "unknown"
    assert _sniff_container(b"\xff\xfb\x90\x00" + b"\x00" * 8) == "mp3"  # MPEG1 L3 128k 44.1k
    assert _sniff_container(b"ID3\x04" + b"\x00" * 8) == "mp3"


def test_short_ssnd_aiff_raises_valueerror(tmp_path):
    """A truncated SSND chunk must raise the module's documented
    ValueError, not struct.error (serving maps ValueError to a 400)."""
    from music2dance_tpu.data.aiff import load_aiff

    comm = b"COMM" + (18).to_bytes(4, "big") + (
        (1).to_bytes(2, "big") + (100).to_bytes(4, "big")
        + (16).to_bytes(2, "big")
        + b"\x40\x0c\xac\x44\x00\x00\x00\x00\x00\x00"  # 22050 as ext80
    )
    ssnd = b"SSND" + (4).to_bytes(4, "big") + b"\x00\x00\x00\x00"
    body = b"AIFF" + comm + ssnd
    p = str(tmp_path / "short.aiff")
    with open(p, "wb") as f:
        f.write(b"FORM" + len(body).to_bytes(4, "big") + body)
    with pytest.raises(ValueError, match="short SSND"):
        load_aiff(p)


def test_supported_extensions_cover_aifc():
    from music2dance_tpu.data.wav import SUPPORTED_EXTENSIONS

    for ext in (".aifc", ".aif", ".aiff", ".mp3", ".ogg", ".oga"):
        assert ext in SUPPORTED_EXTENSIONS
