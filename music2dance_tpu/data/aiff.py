"""Pure-numpy AIFF / AIFF-C decoder (mono float32 out).

The reference's frontend enters through ``librosa.load`` (SURVEY.md
§3.1), which decodes anything soundfile/audioread accepts — AIFF being
the classic mac-world sibling of WAV. This decoder covers the PCM family
of the format from scratch, mirroring data/wav.py's semantics (mono
mixdown by mean, float32 in [-1, 1], same function contract):

- FORM/AIFF and FORM/AIFC containers, chunk-walked with odd-size padding
- COMM: channels, frame count, sample width, 80-bit extended-float rate
- SSND: PCM 8/16/24/32-bit big-endian; AIFC compression types 'NONE'
  (BE PCM), 'sowt' (LE PCM16 — the quicktime byte-swap variant), 'fl32'/
  'FL32' and 'fl64'/'FL64' (big-endian IEEE floats)
- anything compressed (ulaw/alaw/ima4/...) fails loudly by name

No stdlib ``aifc`` (removed in python 3.13) and no external deps.
"""

from __future__ import annotations

import struct

import numpy as np


def _parse_extended80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (big-endian) -> python float.

    Layout: 1 sign bit, 15 exponent bits (bias 16383), 64 mantissa bits
    WITH an explicit integer bit. This is how AIFF stores sample rates
    (so 44100.0 round-trips exactly).
    """
    if len(b) != 10:
        raise ValueError(f"extended float needs 10 bytes, got {len(b)}")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite sample rate in COMM chunk")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _walk_iff_chunks(data: bytes, start: int = 12):
    """Yield (tag, body_offset, body_size); chunks pad to even sizes."""
    pos = start
    n = len(data)
    while pos + 8 <= n:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack(">I", data[pos + 4 : pos + 8])
        body = pos + 8
        yield tag, body, min(size, n - body)
        pos = body + size + (size & 1)


def load_aiff(path: str) -> "tuple[np.ndarray, int]":
    """Decode an AIFF/AIFC file to (mono float32 samples, sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 12 or data[:4] != b"FORM":
        raise ValueError(f"{path!r} is not an IFF FORM file")
    form_type = data[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise ValueError(
            f"{path!r}: FORM type {form_type!r} is not AIFF/AIFC"
        )

    comm = None
    comp = b"NONE"
    for tag, off, size in _walk_iff_chunks(data):
        if tag == b"COMM":
            if size < 18:
                raise ValueError(f"short COMM chunk in {path!r}")
            ch, n_frames, bits = struct.unpack(">hIh", data[off : off + 8])
            sr = _parse_extended80(data[off + 8 : off + 18])
            if form_type == b"AIFC" and size >= 22:
                comp = data[off + 18 : off + 22]
            comm = (ch, n_frames, bits, sr)
        elif tag == b"SSND":
            if comm is None:
                raise ValueError(f"SSND before COMM in {path!r}")
            ch, n_frames, bits, sr = comm
            if ch < 1:
                raise ValueError(f"bad channel count {ch} in {path!r}")
            if size < 8 or off + 8 > len(data):
                raise ValueError(f"short SSND chunk in {path!r}")
            (offset, _block) = struct.unpack(">II", data[off : off + 8])
            body = data[off + 8 + offset : off + size]
            x = _decode_samples(body, bits, comp, path)
            if ch > 1:
                x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
            # trust COMM's frame count when the chunk over-reads
            if n_frames and len(x) > n_frames:
                x = x[:n_frames]
            sr_i = int(round(sr))
            if sr_i <= 0:
                raise ValueError(f"bad sample rate {sr} in {path!r}")
            return x.astype(np.float32), sr_i
    raise ValueError(f"no SSND chunk in {path!r}")


def _decode_samples(body: bytes, bits: int, comp: bytes, path: str) -> np.ndarray:
    comp_u = comp.upper()
    if comp_u in (b"FL32",):
        return np.frombuffer(body[: len(body) & ~3], ">f4").astype(np.float32)
    if comp_u in (b"FL64",):
        return np.frombuffer(body[: len(body) & ~7], ">f8").astype(np.float32)
    if comp == b"sowt":
        if bits != 16:
            raise ValueError(f"'sowt' with {bits}-bit samples in {path!r}")
        return (
            np.frombuffer(body[: len(body) & ~1], "<i2").astype(np.float32)
            / 32768.0
        )
    if comp_u not in (b"NONE",):
        raise ValueError(
            f"{path!r}: AIFC compression {comp!r} is not supported "
            "(PCM/'sowt'/'fl32'/'fl64' only) — convert with "
            "`ffmpeg -i in.aiff out.wav`."
        )
    if bits == 16:
        x = np.frombuffer(body[: len(body) & ~1], ">i2").astype(np.float32)
        return x / 32768.0
    if bits == 8:  # AIFF 8-bit PCM is SIGNED (unlike WAV's unsigned u8)
        return np.frombuffer(body, np.int8).astype(np.float32) / 128.0
    if bits == 32:
        x = np.frombuffer(body[: len(body) & ~3], ">i4").astype(np.float32)
        return x / 2147483648.0
    if bits == 24:
        raw = np.frombuffer(body[: len(body) - len(body) % 3], np.uint8)
        raw = raw.reshape(-1, 3)
        x = (
            (raw[:, 0].astype(np.int32) << 16)
            | (raw[:, 1].astype(np.int32) << 8)
            | raw[:, 2].astype(np.int32)
        )
        return ((x << 8) >> 8).astype(np.float32) / 8388608.0
    raise ValueError(f"unsupported AIFF sample width {bits} in {path!r}")
