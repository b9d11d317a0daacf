"""WAV decode/encode: native C++ decoder (ctypes) with numpy fallback.

The native path (native/m2d_wav.cc -> native/build/libm2dwav.so) is the
framework's replacement for the audio-decode C code the reference gets
from the librosa/audioread wheels. ``ensure_native()`` builds it with make
on first use; if no toolchain is available, a pure-numpy RIFF parser with
identical semantics (PCM8/16/24/32 + float32, mono mixdown) takes over —
the two are cross-checked in tests/test_wav.py. load_wav() also routes
FLAC/AIFF (from-scratch decoders), MP3/Ogg-Vorbis (system codecs) and
M4A/MP4 (system libav shim).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libm2dwav.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def ensure_native(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native decoder; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or (_lib_tried and not build):
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and build and os.path.isdir(_NATIVE_DIR):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.m2d_wav_decode.restype = ctypes.c_long
        lib.m2d_wav_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.m2d_wav_encode.restype = ctypes.c_int
        lib.m2d_wav_encode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
        ]
        _lib = lib
    return _lib


def load_wav_native(path: str) -> tuple[np.ndarray, int]:
    lib = ensure_native()
    if lib is None:
        raise RuntimeError("native WAV decoder unavailable")
    sr = ctypes.c_int(0)
    n = lib.m2d_wav_decode(path.encode(), None, 0, ctypes.byref(sr))
    if n < 0:
        raise ValueError(f"cannot decode {path!r} (code {n})")
    buf = np.empty(n, np.float32)
    got = lib.m2d_wav_decode(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ctypes.byref(sr),
    )
    if got != n:
        raise ValueError(f"short decode of {path!r}: {got}/{n}")
    return buf, sr.value


def _walk_chunks(data: bytes):
    """Yield (tag, body_offset, size) for each RIFF chunk in ``data``."""
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        yield tag, pos + 8, size
        pos += 8 + size + (size & 1)


def _parse_fmt(body: bytes) -> dict:
    """Decode a fmt chunk body (shared by the numpy decoder and the
    PCM16 fast path — one copy of the WAVE_FORMAT_EXTENSIBLE logic)."""
    code = int.from_bytes(body[0:2], "little")
    if code == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real code is the first two
        # bytes of the SubFormat GUID (fmt extension offset 24);
        # without a readable extension it stays 0xFFFE -> rejected.
        cb = int.from_bytes(body[16:18], "little") if len(body) >= 18 else 0
        if cb >= 22 and len(body) >= 26:
            code = int.from_bytes(body[24:26], "little")
    return {
        "format": code,
        "channels": int.from_bytes(body[2:4], "little"),
        "sr": int.from_bytes(body[4:8], "little"),
        "bits": int.from_bytes(body[14:16], "little"),
    }


def load_wav_numpy(path: str) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF parser, same semantics as the native decoder."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError(f"{path!r} is not a RIFF/WAVE file")
    fmt = None
    for tag, off, size in _walk_chunks(data):
        body = data[off : off + size]
        if tag == b"fmt ":
            fmt = _parse_fmt(body)
        elif tag == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            ch, bits = fmt["channels"], fmt["bits"]
            if fmt["format"] == 3 and bits == 32:
                x = np.frombuffer(body, "<f4").astype(np.float32)
            elif fmt["format"] == 1 and bits == 8:
                # 8-bit WAV is unsigned with a 128 bias (RIFF spec)
                x = (np.frombuffer(body, np.uint8).astype(np.float32) - 128.0) / 128.0
            elif fmt["format"] == 1 and bits == 16:
                x = np.frombuffer(body, "<i2").astype(np.float32) / 32768.0
            elif fmt["format"] == 1 and bits == 32:
                x = np.frombuffer(body, "<i4").astype(np.float32) / 2147483648.0
            elif fmt["format"] == 1 and bits == 24:
                raw = np.frombuffer(body, np.uint8).reshape(-1, 3)
                x = (
                    raw[:, 0].astype(np.int32)
                    | (raw[:, 1].astype(np.int32) << 8)
                    | (raw[:, 2].astype(np.int32) << 16)
                )
                x = (x << 8 >> 8).astype(np.float32) / 8388608.0
            else:
                raise ValueError(f"unsupported wav encoding in {path!r}")
            if ch > 1:
                x = x.reshape(-1, ch).mean(axis=1)
            return x.astype(np.float32), fmt["sr"]
    raise ValueError(f"no data chunk in {path!r}")


def _looks_like_mpeg_frame(head: bytes) -> bool:
    """Validate a full 4-byte MPEG audio frame header, not just the
    11-bit sync — raw PCM whose first sample is e.g. int16 -1 starts
    FF FF, which would pass a sync-only test (the serving layer sniffs
    request bodies that may be raw samples)."""
    if len(head) < 4 or head[0] != 0xFF or (head[1] & 0xE0) != 0xE0:
        return False
    version = (head[1] >> 3) & 0x3   # 01 reserved
    layer = (head[1] >> 1) & 0x3     # 00 reserved
    bitrate = (head[2] >> 4) & 0xF   # 1111 invalid
    samplerate = (head[2] >> 2) & 0x3  # 11 reserved
    return version != 1 and layer != 0 and bitrate != 0xF and samplerate != 3


def _sniff_container(head: bytes) -> str:
    """Identify the audio container from its magic bytes ('wav', a known
    non-WAV format name, or 'unknown')."""
    if len(head) >= 12 and head[:4] == b"RIFF" and head[8:12] == b"WAVE":
        return "wav"
    if head[:4] == b"fLaC":
        return "flac"
    if head[:4] == b"OggS":
        return "ogg"
    if head[:3] == b"ID3" or _looks_like_mpeg_frame(head):
        return "mp3"
    if head[:4] == b"FORM":
        return "aiff"
    if len(head) >= 8 and head[4:8] == b"ftyp":
        return "m4a"
    return "unknown"


#: every container load_wav decodes (sniffed by magic bytes, not extension)
SUPPORTED_EXTENSIONS = (
    ".wav", ".flac", ".aiff", ".aif", ".aifc", ".mp3", ".ogg", ".oga",
    ".m4a", ".mp4",
)


def load_wav(path: str, target_sr: Optional[int] = None) -> tuple[np.ndarray, int]:
    """Decode a WAV/FLAC/AIFF/MP3/Ogg-Vorbis/M4A file to (mono f32, rate).

    ``target_sr``: resample to this rate when the file's native rate
    differs (librosa.load(path, sr=...) semantics — SURVEY.md §3.1); the
    kaiser-sinc polyphase resampler lives in audio/resample.py.

    WAV, FLAC and AIFF/AIFC decode on this package's from-scratch
    decoders; MP3 and Ogg Vorbis bind the system codecs (data/mp3.py,
    data/oggvorbis.py) and M4A/MP4 the system libav (data/m4a.py +
    native/m2d_avdec.cc) — the reference's own librosa→audioread
    strategy. Anything else fails loudly with the detected format named.
    """
    with open(path, "rb") as f:
        head = f.read(12)
    kind = _sniff_container(head)
    if kind == "flac":
        from .flac import load_flac

        y, sr = load_flac(path)
    elif kind == "aiff":
        from .aiff import load_aiff

        y, sr = load_aiff(path)
    elif kind == "mp3":
        from .mp3 import load_mp3, mp3_available

        if not mp3_available():
            raise ValueError(
                f"{path!r} is an MP3 file but system libmpg123 was not "
                "found; convert it first, e.g. "
                f"`ffmpeg -i {os.path.basename(path)} out.wav`."
            )
        y, sr = load_mp3(path)
    elif kind == "ogg":
        from .oggvorbis import load_ogg, vorbis_available

        if not vorbis_available():
            raise ValueError(
                f"{path!r} is an Ogg file but system libvorbisfile was not "
                "found; convert it first, e.g. "
                f"`ffmpeg -i {os.path.basename(path)} out.wav`."
            )
        y, sr = load_ogg(path)
    elif kind == "m4a":
        from .m4a import avdec_available, load_m4a

        if not avdec_available():
            raise ValueError(
                f"{path!r} is an M4A/MP4 file but the system libav decode "
                "shim is unavailable; convert it first, e.g. "
                f"`ffmpeg -i {os.path.basename(path)} out.wav`."
            )
        y, sr = load_m4a(path)
    elif kind != "wav":
        what = (
            f"a {kind.upper()} file" if kind != "unknown"
            else "not a recognized audio container"
        )
        raise ValueError(
            f"{path!r} is {what}: supported formats are WAV (PCM "
            "8/16/24/32-bit, float32, EXTENSIBLE), FLAC, AIFF/AIFC, MP3, "
            "Ogg Vorbis and M4A. Convert it first, e.g. "
            f"`ffmpeg -i {os.path.basename(path)} out.wav`."
        )
    elif ensure_native() is not None:
        y, sr = load_wav_native(path)
    else:
        y, sr = load_wav_numpy(path)
    if target_sr is not None and sr != target_sr:
        from ..audio.resample import resample

        y, sr = resample(y, sr, target_sr), target_sr
    return y, sr


def load_wav_pcm16(path: str, target_sr: Optional[int] = None) -> tuple[np.ndarray, int]:
    """Like load_wav, but keep MONO PCM16 files already at ``target_sr``
    as raw int16 samples (no host dequantization).

    Feeding int16 arrays to the batch inference API ships them to the
    device at half the bytes; the on-device dequant (x / 32768) is
    bit-identical to the host conversion (audio/frontend.py
    pad_and_extract_batch). Anything else — stereo, other encodings, or a
    rate mismatch needing the resampler — falls back to the float32 path.

    Only the header is read to make the decision (the fmt chunk sits in
    the first bytes of any sane WAV); the full file is read once and only
    on the fast path.
    """
    sniff = 8192
    with open(path, "rb") as f:
        data = f.read(sniff)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return load_wav(path, target_sr=target_sr)
    for tag, off, size in _walk_chunks(data):
        if tag == b"fmt " and off + size <= len(data):
            fmt = _parse_fmt(data[off : off + size])
            pcm16_mono = (
                fmt["format"] == 1 and fmt["bits"] == 16 and fmt["channels"] == 1
            )
            if not pcm16_mono or (target_sr is not None and fmt["sr"] != target_sr):
                break  # f32 path decides (decode / mixdown / resample)
            # fast path: one sequential read of the whole file, then the
            # data chunk is returned as raw int16
            with open(path, "rb") as f:
                data = f.read()
            for tag2, off2, size2 in _walk_chunks(data):
                if tag2 == b"data":
                    body = data[off2 : off2 + size2]
                    if len(body) % 2 != 0:
                        # truncated/corrupt data chunk: fall back to the
                        # f32 decoder like every other anomaly here,
                        # instead of letting numpy raise on the odd buffer
                        break
                    return np.frombuffer(body, "<i2").copy(), fmt["sr"]
            break  # odd/absent data chunk in sniff-approved file: f32 path
        if off + size > len(data):
            break  # fmt chunk beyond the sniff window: fall back
    return load_wav(path, target_sr=target_sr)


def save_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Encode mono float32 samples as PCM16 (native if available)."""
    samples = np.ascontiguousarray(samples, np.float32)
    lib = ensure_native()
    if lib is not None:
        rc = lib.m2d_wav_encode(
            path.encode(),
            samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(samples),
            sample_rate,
        )
        if rc != 0:
            raise IOError(f"native wav encode failed for {path!r}")
        return
    pcm = (np.clip(samples, -1.0, 1.0) * 32767.0).astype("<i2")
    data = pcm.tobytes()
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + (sample_rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little")
    )
    with open(path, "wb") as f:
        f.write(hdr + data)
