"""WAV decoder tests: native C++ vs numpy parser cross-check + scipy oracle."""

import numpy as np
import pytest
import scipy.io.wavfile

from music2dance_tpu.data.wav import (
    ensure_native,
    load_wav_numpy,
    load_wav,
    save_wav,
)


def make_tone(sr=8000, seconds=0.25):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


def test_save_load_round_trip(tmp_path):
    sr, y = 8000, make_tone()
    path = str(tmp_path / "tone.wav")
    save_wav(path, y, sr)
    out, sr2 = load_wav(path)
    assert sr2 == sr
    assert out.shape == y.shape
    # PCM16: encode rounds at x32767, decode divides by 32768 -> |err| <= 1.5/32768
    np.testing.assert_allclose(out, y, atol=1.5 / 32768 + 1e-7)


@pytest.mark.parametrize("dtype", ["int16", "int32", "float32"])
def test_against_scipy_writer(tmp_path, dtype):
    sr, y = 8000, make_tone()
    path = str(tmp_path / f"{dtype}.wav")
    if dtype == "int16":
        scipy.io.wavfile.write(path, sr, (y * 32767).astype(np.int16))
        atol = 1.5 / 32768
    elif dtype == "int32":
        scipy.io.wavfile.write(path, sr, (y * 2147483647).astype(np.int32))
        atol = 1e-6
    else:
        scipy.io.wavfile.write(path, sr, y)
        atol = 0.0
    out, sr2 = load_wav_numpy(path)
    assert sr2 == sr
    np.testing.assert_allclose(out, y, atol=atol + 1e-7)


def test_stereo_mixdown(tmp_path):
    sr = 8000
    left, right = make_tone(), -make_tone()
    stereo = np.stack([left, right], axis=1)
    path = str(tmp_path / "stereo.wav")
    scipy.io.wavfile.write(path, sr, stereo)
    out, _ = load_wav_numpy(path)
    np.testing.assert_allclose(out, np.zeros_like(left), atol=1e-6)


def test_native_matches_numpy(tmp_path):
    lib = ensure_native()
    if lib is None:
        pytest.skip("native decoder not built (no toolchain)")
    from music2dance_tpu.data.wav import load_wav_native

    sr, y = 8000, make_tone()
    for name, writer in [
        ("i16.wav", lambda p: scipy.io.wavfile.write(p, sr, (y * 32767).astype(np.int16))),
        ("f32.wav", lambda p: scipy.io.wavfile.write(p, sr, y)),
    ]:
        path = str(tmp_path / name)
        writer(path)
        a, sra = load_wav_native(path)
        b, srb = load_wav_numpy(path)
        assert sra == srb == sr
        np.testing.assert_array_equal(a, b, err_msg=name)


def write_extensible_wav(path, y, sr, subformat):
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) writer: 40-byte fmt chunk whose
    SubFormat GUID carries the real code (1 = PCM16, 3 = float32)."""
    if subformat == 3:
        data = y.astype("<f4").tobytes()
        bits = 32
    else:
        data = (np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
        bits = 16
    guid = subformat.to_bytes(2, "little") + bytes.fromhex(
        "0000000000100080 00aa00389b71".replace(" ", "")
    )
    fmt = (
        (0xFFFE).to_bytes(2, "little")
        + (1).to_bytes(2, "little")                    # channels
        + sr.to_bytes(4, "little")
        + (sr * bits // 8).to_bytes(4, "little")       # byte rate
        + (bits // 8).to_bytes(2, "little")            # block align
        + bits.to_bytes(2, "little")
        + (22).to_bytes(2, "little")                   # cbSize
        + bits.to_bytes(2, "little")                   # valid bits
        + (4).to_bytes(4, "little")                    # channel mask
        + guid
    )
    body = b"WAVEfmt " + len(fmt).to_bytes(4, "little") + fmt
    body += b"data" + len(data).to_bytes(4, "little") + data
    with open(path, "wb") as f:
        f.write(b"RIFF" + len(body).to_bytes(4, "little") + body)


@pytest.mark.parametrize("subformat", [1, 3])
def test_extensible_wav(tmp_path, subformat):
    """0xFFFE files must decode by their SubFormat GUID code — an
    extensible float32 file decoded as int32 PCM yields ~1e-9 garbage
    (round-1 advisor finding, native/m2d_wav.cc + data/wav.py)."""
    sr, y = 8000, make_tone()
    path = str(tmp_path / f"ext{subformat}.wav")
    write_extensible_wav(path, y, sr, subformat)
    atol = 0.0 if subformat == 3 else 1.5 / 32768
    out, sr2 = load_wav_numpy(path)
    assert sr2 == sr
    np.testing.assert_allclose(out, y, atol=atol + 1e-7)
    if ensure_native() is not None:
        from music2dance_tpu.data.wav import load_wav_native

        out_n, sr_n = load_wav_native(path)
        assert sr_n == sr
        np.testing.assert_array_equal(out_n, out)


def test_bad_file_rejected(tmp_path):
    path = str(tmp_path / "junk.wav")
    with open(path, "wb") as f:
        f.write(b"this is not a wav file at all........")
    with pytest.raises(ValueError):
        load_wav_numpy(path)


def test_load_wav_pcm16_fast_path(tmp_path):
    """Mono PCM16 at the target rate stays int16 (raw samples); stereo or
    rate-mismatched files fall back to the float32 decode path."""
    from music2dance_tpu.data.wav import load_wav_pcm16

    sr = 8000
    y = make_tone(sr)
    path = str(tmp_path / "mono16.wav")
    save_wav(path, y, sr)

    raw, got_sr = load_wav_pcm16(path, target_sr=sr)
    assert raw.dtype == np.int16 and got_sr == sr
    ref, _ = load_wav(path)
    np.testing.assert_array_equal(raw.astype(np.float32) / 32768.0, ref)

    # no target_sr: also fast-pathed
    raw2, _ = load_wav_pcm16(path)
    np.testing.assert_array_equal(raw2, raw)

    # rate mismatch -> resampled f32 fallback, same as load_wav
    res, res_sr = load_wav_pcm16(path, target_sr=4000)
    assert res.dtype == np.float32 and res_sr == 4000
    ref_res, _ = load_wav(path, target_sr=4000)
    np.testing.assert_array_equal(res, ref_res)

    # stereo -> f32 mixdown fallback
    spath = str(tmp_path / "stereo16.wav")
    stereo = np.stack([y, -y], axis=1)
    scipy.io.wavfile.write(spath, sr, (stereo * 32767).astype(np.int16))
    sm, _ = load_wav_pcm16(spath, target_sr=sr)
    assert sm.dtype == np.float32
