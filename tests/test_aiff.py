"""AIFF/AIFC decoder: spec-following test encoder -> decode parity with
the WAV path, 80-bit rate round-trip, AIFC variants, error paths."""

import struct

import numpy as np
import pytest

from music2dance_tpu.data.aiff import _parse_extended80, load_aiff
from music2dance_tpu.data.wav import load_wav


def _extended80(x: float) -> bytes:
    """Encode a positive float as 80-bit IEEE extended (the way AIFF
    stores sample rates)."""
    assert x > 0
    import math

    m, e = math.frexp(x)  # x = m * 2**e, m in [0.5, 1)
    exp = e - 1 + 16383
    mant = int(m * 2 ** 64)
    return struct.pack(">HQ", exp, mant)


def write_aiff(path, samples, sr, bits=16, channels=1, comp=None):
    """Minimal spec-following AIFF/AIFC writer (tests only).

    ``samples``: float32 [-1, 1), interleaved if channels > 1 (flat array
    of frame-major samples). ``comp``: None for plain AIFF; b"sowt" /
    b"fl32" / b"NONE" (etc.) for an AIFC container.
    """
    x = np.asarray(samples, np.float64)
    n_frames = len(x) // channels
    if comp in (b"fl32", b"FL32"):
        body = x.astype(">f4").tobytes()
        bits = 32
    elif comp in (b"fl64", b"FL64"):
        body = x.astype(">f8").tobytes()
        bits = 64
    elif comp == b"sowt":
        body = np.round(x * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
        bits = 16
    elif bits == 16:
        body = np.round(x * 32768.0).clip(-32768, 32767).astype(">i2").tobytes()
    elif bits == 8:
        body = np.round(x * 128.0).clip(-128, 127).astype(np.int8).tobytes()
    elif bits == 32:
        q = np.round(x * 2147483648.0).clip(-2 ** 31, 2 ** 31 - 1)
        body = q.astype(">i4").tobytes()
    elif bits == 24:
        q = np.round(x * 8388608.0).clip(-2 ** 23, 2 ** 23 - 1).astype(np.int32)
        b = np.zeros((len(q), 3), np.uint8)
        b[:, 0] = (q >> 16) & 0xFF
        b[:, 1] = (q >> 8) & 0xFF
        b[:, 2] = q & 0xFF
        body = b.tobytes()
    else:
        raise ValueError(bits)

    is_aifc = comp is not None
    comm = struct.pack(">hIh", channels, n_frames, bits) + _extended80(sr)
    if is_aifc:
        comm += comp + b"\x00\x00"  # empty pstring name, even-padded
    ssnd = struct.pack(">II", 0, 0) + body
    chunks = b""
    if is_aifc:
        chunks += b"FVER" + struct.pack(">I", 4) + struct.pack(">I", 0xA2805140)
    for tag, payload in ((b"COMM", comm), (b"SSND", ssnd)):
        chunks += tag + struct.pack(">I", len(payload)) + payload
        if len(payload) & 1:
            chunks += b"\x00"
    form_type = b"AIFC" if is_aifc else b"AIFF"
    blob = b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks
    with open(path, "wb") as f:
        f.write(blob)


def _tone(n, channels=1, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n * channels) / 100.0
    return (0.5 * np.sin(t) + 0.1 * rng.standard_normal(n * channels)).clip(-0.9, 0.9)


def test_extended80_round_trip():
    for sr in (8000, 11025, 22050, 44100, 48000, 96000):
        assert _parse_extended80(_extended80(float(sr))) == float(sr)
    assert _parse_extended80(b"\x00" * 10) == 0.0
    with pytest.raises(ValueError):
        _parse_extended80(struct.pack(">HQ", 0x7FFF, 1))  # inf/nan
    with pytest.raises(ValueError):
        _parse_extended80(b"\x00" * 9)


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_aiff_pcm_widths(tmp_path, bits):
    x = _tone(500)
    path = str(tmp_path / f"t{bits}.aiff")
    write_aiff(path, x, 22050, bits=bits)
    y, sr = load_aiff(path)
    assert sr == 22050 and y.dtype == np.float32 and len(y) == 500
    tol = {8: 1 / 128, 16: 1 / 32768, 24: 1 / 8388608, 32: 1e-7}[bits]
    np.testing.assert_allclose(y, x, atol=tol)


def test_aiff_stereo_mixdown_matches_wav_convention(tmp_path):
    left, right = _tone(300, seed=1), _tone(300, seed=2)
    inter = np.empty(600)
    inter[0::2], inter[1::2] = left, right
    path = str(tmp_path / "st.aiff")
    write_aiff(path, inter, 44100, bits=16, channels=2)
    y, sr = load_aiff(path)
    assert sr == 44100 and len(y) == 300
    q = lambda v: np.round(v * 32768.0).clip(-32768, 32767) / 32768.0
    np.testing.assert_allclose(y, (q(left) + q(right)) / 2.0, atol=1e-7)


@pytest.mark.parametrize("comp", [b"NONE", b"sowt", b"fl32", b"fl64"])
def test_aifc_variants(tmp_path, comp):
    x = _tone(400, seed=3)
    path = str(tmp_path / "c.aifc")
    write_aiff(path, x, 22050, comp=comp)
    y, sr = load_aiff(path)
    assert sr == 22050 and len(y) == 400
    tol = 1e-6 if comp in (b"fl32", b"fl64") else 1 / 32768
    np.testing.assert_allclose(y, x, atol=tol)


def test_aiff_via_load_wav_dispatch_and_resample(tmp_path):
    """load_wav sniffs FORM -> AIFF decode -> resample to target, same
    entry point as WAV/FLAC (librosa.load semantics)."""
    x = _tone(2205, seed=4)
    path = str(tmp_path / "d.aiff")
    write_aiff(path, x, 44100, bits=16)
    y, sr = load_wav(path, target_sr=22050)
    assert sr == 22050
    assert abs(len(y) - 1103) <= 2  # ~2205 * 22050/44100


def test_aiff_decode_matches_wav_decode(tmp_path):
    """The same PCM16 payload through AIFF (big-endian) and WAV
    (little-endian) must decode identically."""
    import wave as wv

    x = _tone(700, seed=5)
    q = np.round(x * 32768.0).clip(-32768, 32767).astype(np.int16)

    apath = str(tmp_path / "same.aiff")
    write_aiff(apath, x, 22050, bits=16)
    wpath = str(tmp_path / "same.wav")
    with wv.open(wpath, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(22050)
        f.writeframes(q.astype("<i2").tobytes())

    ya, _ = load_wav(apath)
    yw, _ = load_wav(wpath)
    np.testing.assert_array_equal(ya, yw)


def test_aiff_error_paths(tmp_path):
    x = _tone(50)
    path = str(tmp_path / "bad.aifc")
    write_aiff(path, x, 22050, comp=b"NONE")
    raw = open(path, "rb").read()

    # unsupported compression named in the error
    ulaw = raw.replace(b"NONE", b"ulaw")
    p2 = str(tmp_path / "ulaw.aifc")
    open(p2, "wb").write(ulaw)
    with pytest.raises(ValueError, match="ulaw"):
        load_aiff(p2)

    # truncated header
    p3 = str(tmp_path / "trunc.aiff")
    open(p3, "wb").write(raw[:10])
    with pytest.raises(ValueError):
        load_aiff(p3)

    # FORM but not AIFF/AIFC
    p4 = str(tmp_path / "form.aiff")
    open(p4, "wb").write(b"FORM" + struct.pack(">I", 4) + b"XXXX")
    with pytest.raises(ValueError, match="XXXX"):
        load_aiff(p4)


def test_aiff_in_pose_source(tmp_path):
    """WavPoseSource pairs .aiff songs with .npy poses like .wav/.flac."""
    from music2dance_tpu.data.pipeline import WavPoseSource

    x = _tone(2205, seed=6)
    write_aiff(str(tmp_path / "clip.aiff"), x, 22050, bits=16)
    np.save(str(tmp_path / "clip.npy"),
            np.zeros((12, 23, 3), np.float32))
    src = WavPoseSource(str(tmp_path))
    assert len(src) == 1
    item = src[0]
    assert item["wave"].dtype == np.float32 and len(item["wave"]) == 2205
    assert item["pose"].shape == (12, 69)
