"""Ogg Vorbis decode via the system libvorbisfile codec (ctypes).

Same delegation strategy as data/mp3.py (and as the reference's
``librosa.load`` → audioread path, SURVEY.md §3.1): the system codec does
the lossy-format DSP, this binding gets float32 straight out of the
decoder (``ov_read_float``) with no intermediate quantization.

``vorbis_available()`` is False when ``libvorbisfile`` is absent, in which
case the loader's named-format error stands (data/wav.py load_wav). An
Ogg container whose first logical stream is not Vorbis (Opus, Theora,
Ogg-FLAC) fails with the ov_fopen error code named.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

# libvorbis return codes (vorbis/codec.h)
_OV_ERRORS = {
    -3: "OV_HOLE (data gap)",
    -128: "OV_EREAD (read error)",
    -129: "OV_EFAULT (internal fault)",
    -130: "OV_EIMPL (unimplemented feature)",
    -131: "OV_EINVAL (invalid argument)",
    -132: "OV_ENOTVORBIS (Ogg container without a Vorbis stream)",
    -133: "OV_EBADHEADER (corrupt Vorbis header)",
    -134: "OV_EVERSION (unsupported Vorbis version)",
    -136: "OV_EBADLINK (corrupt link)",
    -137: "OV_ENOSEEK (stream not seekable)",
}

# sizeof(OggVorbis_File) is ~944 on x86-64; the struct is caller-allocated
# so over-allocate generously and let libvorbisfile own the layout.
_OVFILE_BYTES = 4096

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


class _VorbisInfoHead(ctypes.Structure):
    """Leading fields of vorbis_info (vorbis/codec.h) — all this binding
    reads; the struct continues past these."""

    _fields_ = [
        ("version", ctypes.c_int),
        ("channels", ctypes.c_int),
        ("rate", ctypes.c_long),
    ]


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    for name in ("libvorbisfile.so.3", "libvorbisfile.so"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        lib.ov_fopen.restype = ctypes.c_int
        lib.ov_fopen.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.ov_info.restype = ctypes.c_void_p
        lib.ov_info.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ov_read_float.restype = ctypes.c_long
        lib.ov_read_float.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float))),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ov_clear.restype = ctypes.c_int
        lib.ov_clear.argtypes = [ctypes.c_void_p]
        lib.ov_pcm_seek.restype = ctypes.c_int
        lib.ov_pcm_seek.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        break
    return _lib


def vorbis_available() -> bool:
    return _load_lib() is not None


def load_ogg(path: str) -> tuple[np.ndarray, int]:
    """Decode an Ogg Vorbis file to (mono float32 samples, sample_rate)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("system libvorbisfile not found — cannot decode Ogg")
    vf = ctypes.create_string_buffer(_OVFILE_BYTES)
    rc = lib.ov_fopen(path.encode(), vf)
    if rc != 0:
        raise ValueError(
            f"cannot open {path!r} as Ogg Vorbis: "
            f"{_OV_ERRORS.get(rc, f'error {rc}')}"
        )
    try:
        # The open-time chain scan can leave the read cursor at the LAST
        # link of a chained file (observed with this libvorbisfile:
        # reading after open yielded only the final link); rewind
        # explicitly — a no-op for single-stream files.
        lib.ov_pcm_seek(vf, 0)
        vi_ptr = lib.ov_info(vf, -1)
        if not vi_ptr:
            raise ValueError(f"no Vorbis stream info in {path!r}")
        info = _VorbisInfoHead.from_address(vi_ptr)
        ch, sr = info.channels, int(info.rate)
        if ch < 1:
            raise ValueError(f"invalid channel count {ch} in {path!r}")
        pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
        bitstream = ctypes.c_int(0)
        link = 0  # current chain link; format changes across links rejected
        chunks: list[np.ndarray] = []
        holes = 0
        while True:
            n = lib.ov_read_float(vf, ctypes.byref(pcm), 4096, ctypes.byref(bitstream))
            if n == 0:
                break
            if n < 0:
                # OV_HOLE (-3) marks a recoverable gap; anything else at
                # the same position would spin forever if retried blindly.
                holes += 1
                if n != -3 or holes > 64:
                    raise ValueError(
                        f"unrecoverable Vorbis decode error in {path!r}: "
                        f"{_OV_ERRORS.get(n, f'error {n}')}"
                    )
                continue
            if bitstream.value != link:
                # chained stream (concatenated encodes): later links may
                # change channels/rate — pcm[c] beyond the link's channel
                # count would be an invalid pointer, so check first
                link = bitstream.value
                vi_ptr = lib.ov_info(vf, link)
                info = _VorbisInfoHead.from_address(vi_ptr) if vi_ptr else None
                if info is None or info.channels != ch or int(info.rate) != sr:
                    raise ValueError(
                        f"{path!r}: chained Ogg stream changes format at "
                        f"link {link} ({ch}ch/{sr} Hz -> "
                        f"{info.channels if info else '?'}ch/"
                        f"{int(info.rate) if info else '?'} Hz)"
                    )
            if ch == 1:
                chunks.append(np.ctypeslib.as_array(pcm[0], shape=(n,)).copy())
            else:
                frame = np.empty((n, ch), np.float32)
                for c in range(ch):
                    frame[:, c] = np.ctypeslib.as_array(pcm[c], shape=(n,))
                chunks.append(frame.mean(axis=1))
    finally:
        lib.ov_clear(vf)
    if not chunks:
        raise ValueError(f"no audio frames decoded from {path!r}")
    return np.ascontiguousarray(np.concatenate(chunks), np.float32), sr
