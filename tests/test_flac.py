"""FLAC decoder tests against a spec-following encoder written here.

No FLAC tooling exists in the container (no libsndfile/ffmpeg/flac), so —
like the WAV and librosa-oracle suites — the oracle is our own: an
encoder written directly from the FLAC format spec (frame headers with
CRC-8/CRC-16, constant/verbatim/fixed subframes, Rice-coded residuals,
left/side / mid/side stereo decorrelation). The decoder must invert it
bit-exactly; decoder-internal shortcuts can't hide because encoder and
decoder share no code. When real FLAC files become obtainable, point
revalidate.py at them (SURVEY.md §0).
"""

import numpy as np
import pytest

from music2dance_tpu.data.flac import decode_flac_bytes, load_flac


# ---------------------------------------------------------------------------
# Spec-following encoder (test oracle)
# ---------------------------------------------------------------------------

class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def encode_utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits_needed = n.bit_length()
    n_extra = 1
    while bits_needed > 6 * n_extra + (6 - n_extra):
        n_extra += 1
    lead = (0xFF << (7 - n_extra)) & 0xFF | (n >> (6 * n_extra))
    out.append(lead)
    for i in range(n_extra - 1, -1, -1):
        out.append(0x80 | ((n >> (6 * i)) & 0x3F))
    return bytes(out)


def encode_subframe(w: BitWriter, x: np.ndarray, bps: int, mode: str):
    w.write(0, 1)
    if mode == "constant":
        assert np.all(x == x[0])
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write(int(x[0]), bps)
    elif mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write(int(v), bps)
    elif mode == "fixed2":
        order = 2
        w.write(8 + order, 6)
        w.write(0, 1)
        for v in x[:order]:
            w.write(int(v), bps)
        res = x[order:] - 2 * x[order - 1 : -1] + x[: -order]
        encode_residual(w, res, order)
    else:
        raise AssertionError(mode)


def encode_residual(w: BitWriter, res: np.ndarray, order: int,
                    k: int | None = None):
    """Rice coding, method 0, partition order 0."""
    w.write(0, 2)   # method: 4-bit rice
    w.write(0, 4)   # partition order 0
    zig = (np.abs(res.astype(np.int64)) * 2 - (res < 0)).astype(np.int64)
    if k is None:
        mean = max(1, int(zig.mean()) if len(zig) else 1)
        k = min(14, max(0, int(mean).bit_length() - 1))
    w.write(k, 4)
    for v in zig:
        v = int(v)
        w.write_unary(v >> k)
        w.write(v & ((1 << k) - 1), k)


def encode_frame(frame_idx: int, chans: list[np.ndarray], sr: int, bps: int,
                 modes: list[str], chan_code: int | None = None) -> bytes:
    n = len(chans[0])
    w = BitWriter()
    w.write(0x3FFE, 14)
    w.write(0, 1)   # reserved
    w.write(0, 1)   # fixed blocksize stream
    w.write(7, 4)   # block size: 16-bit value at end
    w.write(0, 4)   # sample rate: from STREAMINFO
    if chan_code is None:
        chan_code = len(chans) - 1
    w.write(chan_code, 4)
    w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
    w.write(0, 1)
    hdr = w.bytes() if w.nbits == 0 else None
    assert hdr is not None
    hdr += encode_utf8_number(frame_idx)
    hdr += (n - 1).to_bytes(2, "big")
    hdr += bytes([crc8(hdr)])

    body = BitWriter()
    extra = {8: (1,), 9: (0,), 10: (1,)}.get(chan_code, ())
    for ci, (x, mode) in enumerate(zip(chans, modes)):
        encode_subframe(body, x, bps + (1 if ci in extra else 0), mode)
    body.align()
    payload = hdr + body.bytes()
    return payload + crc16(payload).to_bytes(2, "big")


def make_flac(chans: list[np.ndarray], sr: int, bps: int, modes=None,
              block: int = 1024, chan_code: int | None = None) -> bytes:
    total = len(chans[0])
    w = BitWriter()
    w.write(1, 1)   # last metadata block
    w.write(0, 7)   # STREAMINFO
    w.write(34, 24)
    w.write(16, 16)
    w.write(65535, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(sr, 20)
    w.write(len(chans) - 1, 3)
    w.write(bps - 1, 5)
    w.write(total, 36)
    for _ in range(16):
        w.write(0, 8)  # md5 unset
    out = b"fLaC" + w.bytes()
    idx = 0
    for start in range(0, total, block):
        seg = [c[start : start + block] for c in chans]
        m = modes[idx % len(modes)] if modes else "verbatim"
        out += encode_frame(idx, seg, sr, bps,
                            [m] * len(chans), chan_code=chan_code)
        idx += 1
    return out


def sine_int(n, bps, freq=440.0, sr=22050, seed=0):
    rng = np.random.default_rng(seed)
    amp = (1 << (bps - 1)) * 0.6
    x = amp * np.sin(2 * np.pi * freq * np.arange(n) / sr)
    x += rng.normal(0, amp * 0.01, n)
    return np.clip(np.round(x), -(1 << (bps - 1)), (1 << (bps - 1)) - 1
                   ).astype(np.int64)


def as_float(x, bps):
    return (x / float(1 << (bps - 1))).astype(np.float32)


# ---------------------------------------------------------------------------
# Decoder tests
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("mode", ["verbatim", "fixed2"])
@pytest.mark.parametrize("bps", [16, 24])
def test_mono_roundtrip(mode, bps):
    x = sine_int(3000, bps)
    data = make_flac([x], 22050, bps, modes=[mode])
    y, sr = decode_flac_bytes(data)
    assert sr == 22050
    np.testing.assert_array_equal(y, as_float(x, bps))


def test_constant_subframe():
    x = np.full(2048, -123, np.int64)
    data = make_flac([x], 8000, 16, modes=["constant"])
    y, sr = decode_flac_bytes(data)
    assert sr == 8000
    np.testing.assert_array_equal(y, as_float(x, 16))


def test_partial_final_frame_and_multiframe():
    x = sine_int(2500, 16)  # 1024 + 1024 + 452
    data = make_flac([x], 44100, 16, modes=["fixed2", "verbatim"])
    y, sr = decode_flac_bytes(data)
    assert len(y) == 2500
    np.testing.assert_array_equal(y, as_float(x, 16))


def test_stereo_independent_mixdown():
    l = sine_int(2000, 16, freq=330, seed=1)
    r = sine_int(2000, 16, freq=550, seed=2)
    data = make_flac([l, r], 22050, 16, modes=["verbatim"])
    y, _ = decode_flac_bytes(data)
    expect = ((l + r) / 2.0 / 32768.0).astype(np.float32)
    np.testing.assert_allclose(y, expect, atol=1e-7)


def test_left_side_and_mid_side():
    l = sine_int(1024, 16, freq=330, seed=3)
    r = sine_int(1024, 16, freq=550, seed=4)
    side = l - r
    # left/side (code 8): channels stored as [left, side]
    data = make_flac([l, side], 22050, 16, modes=["verbatim"], chan_code=8)
    y, _ = decode_flac_bytes(data)
    expect = ((l + r) / 2.0 / 32768.0).astype(np.float32)
    np.testing.assert_allclose(y, expect, atol=1e-7)
    # right/side (code 9): stored [side, right]
    data = make_flac([side, r], 22050, 16, modes=["verbatim"], chan_code=9)
    y, _ = decode_flac_bytes(data)
    np.testing.assert_allclose(y, expect, atol=1e-7)
    # mid/side (code 10): stored [mid, side], mid = (l + r) >> 1
    mid = (l + r) >> 1
    data = make_flac([mid, side], 22050, 16, modes=["verbatim"], chan_code=10)
    y, _ = decode_flac_bytes(data)
    np.testing.assert_allclose(y, expect, atol=1e-7)


def test_load_flac_via_load_wav(tmp_path):
    """load_wav dispatches .flac content by magic, not extension."""
    from music2dance_tpu.data.wav import load_wav

    x = sine_int(4000, 16)
    p = tmp_path / "clip.flac"
    p.write_bytes(make_flac([x], 22050, 16, modes=["fixed2"]))
    y, sr = load_wav(str(p))
    assert sr == 22050
    np.testing.assert_allclose(y, as_float(x, 16), atol=1e-7)
    # and resampling on load still applies (librosa.load(sr=...) semantics)
    y2, sr2 = load_wav(str(p), target_sr=8000)
    assert sr2 == 8000
    assert abs(len(y2) - int(round(4000 * 8000 / 22050))) <= 2


def test_truncated_stream_raises():
    x = sine_int(1024, 16)
    data = make_flac([x], 22050, 16)
    with pytest.raises(ValueError):
        decode_flac_bytes(data[: len(data) // 2])


def test_native_matches_python(tmp_path):
    """The C++ decoder (when buildable) must agree with the Python spec
    implementation on every subframe type and stereo mode."""
    from music2dance_tpu.data.flac import ensure_native_flac

    if ensure_native_flac() is None:
        pytest.skip("native toolchain unavailable")
    l = sine_int(3000, 16, freq=330, seed=5)
    r = sine_int(3000, 16, freq=550, seed=6)
    mid, side = (l + r) >> 1, l - r
    cases = [
        make_flac([l], 22050, 16, modes=["verbatim", "fixed2", "constant"][:2]),
        make_flac([np.full(2048, 7, np.int64)], 8000, 16, modes=["constant"]),
        make_flac([l, r], 22050, 16, modes=["verbatim"]),
        make_flac([mid, side], 22050, 16, modes=["verbatim"], chan_code=10),
        make_flac([sine_int(2500, 24)], 44100, 24, modes=["fixed2"]),
    ]
    for i, data in enumerate(cases):
        p = tmp_path / f"case{i}.flac"
        p.write_bytes(data)
        y_native, sr_native = load_flac(str(p))
        y_py, sr_py = decode_flac_bytes(data)
        assert sr_native == sr_py
        np.testing.assert_allclose(y_native, y_py, atol=1e-7,
                                   err_msg=f"case {i}")
