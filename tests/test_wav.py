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


def test_bad_file_rejected(tmp_path):
    path = str(tmp_path / "junk.wav")
    with open(path, "wb") as f:
        f.write(b"this is not a wav file at all........")
    with pytest.raises(ValueError):
        load_wav_numpy(path)
