"""MP3 decode via the system mpg123 codec (ctypes).

The reference's ``librosa.load`` handles MP3 by delegating to audioread,
which binds whatever system codec is present (SURVEY.md §3.1); this module
is the same strategy made explicit: a direct ctypes binding to
``libmpg123`` with float32 output forced in the decoder, so no
quantize/dequantize round-trip happens on the way to the feature frontend.
WAV/FLAC/AIFF stay on the from-scratch decoders in this package — MP3 is
the one format where reimplementing the DSP (Huffman tables, IMDCT,
polyphase synthesis) buys nothing over the battle-tested system codec.

If ``libmpg123`` is absent, ``mp3_available()`` is False and the loader's
loud named-format error stands (data/wav.py load_wav).
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_NEED_MORE = -10
_MPG123_ADD_FLAGS = 2  # mpg123_parms enum
_MPG123_FORCE_FLOAT = 0x400  # mpg123_param_flags
_MPG123_ENC_FLOAT_32 = 0x200

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    for name in ("libmpg123.so.0", "libmpg123.so"):
        try:
            lib = ctypes.CDLL(name)
        except OSError:
            continue
        # Every handle-taking symbol needs explicit argtypes: ctypes'
        # default int conversion truncates the 64-bit handle.
        lib.mpg123_init.restype = ctypes.c_int
        lib.mpg123_new.restype = ctypes.c_void_p
        lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_param.restype = ctypes.c_int
        lib.mpg123_param.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_long, ctypes.c_double,
        ]
        lib.mpg123_open.restype = ctypes.c_int
        lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.mpg123_getformat.restype = ctypes.c_int
        lib.mpg123_getformat.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mpg123_read.restype = ctypes.c_int
        lib.mpg123_read.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.mpg123_strerror.restype = ctypes.c_char_p
        lib.mpg123_strerror.argtypes = [ctypes.c_void_p]
        lib.mpg123_close.restype = ctypes.c_int
        lib.mpg123_close.argtypes = [ctypes.c_void_p]
        lib.mpg123_delete.restype = None
        lib.mpg123_delete.argtypes = [ctypes.c_void_p]
        lib.mpg123_init()  # no-op since 1.27, required before that
        _lib = lib
        break
    return _lib


def mp3_available() -> bool:
    return _load_lib() is not None


def load_mp3(path: str) -> tuple[np.ndarray, int]:
    """Decode an MP3 file to (mono float32 samples, sample_rate)."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("system libmpg123 not found — cannot decode MP3")
    err = ctypes.c_int(0)
    h = lib.mpg123_new(None, ctypes.byref(err))
    if not h:
        raise RuntimeError(f"mpg123_new failed (code {err.value})")
    try:
        lib.mpg123_param(h, _MPG123_ADD_FLAGS, _MPG123_FORCE_FLOAT, 0.0)
        if lib.mpg123_open(h, path.encode()) != _MPG123_OK:
            raise ValueError(
                f"cannot open {path!r} as MP3: "
                f"{lib.mpg123_strerror(h).decode(errors='replace')}"
            )
        rate = ctypes.c_long(0)
        channels = ctypes.c_int(0)
        encoding = ctypes.c_int(0)
        rc = lib.mpg123_getformat(
            h, ctypes.byref(rate), ctypes.byref(channels), ctypes.byref(encoding)
        )
        if rc != _MPG123_OK or encoding.value != _MPG123_ENC_FLOAT_32:
            raise ValueError(
                f"unexpected mpg123 output format for {path!r} "
                f"(rc {rc}, encoding {encoding.value:#x})"
            )
        sr, ch = rate.value, channels.value
        chunks: list[np.ndarray] = []
        buf = np.empty(1 << 18, np.uint8)
        done = ctypes.c_size_t(0)
        while True:
            rc = lib.mpg123_read(h, buf.ctypes.data, buf.nbytes, ctypes.byref(done))
            if done.value:
                chunks.append(buf[: done.value].copy())
            if rc == _MPG123_DONE:
                break
            if rc == _MPG123_NEW_FORMAT:
                # Rate/channel changes mid-stream would silently corrupt the
                # frame math downstream; re-read the format and insist it
                # only ever *becomes* the advertised one.
                lib.mpg123_getformat(
                    h, ctypes.byref(rate), ctypes.byref(channels),
                    ctypes.byref(encoding),
                )
                if (
                    rate.value != sr
                    or channels.value != ch
                    or encoding.value != _MPG123_ENC_FLOAT_32
                ):
                    raise ValueError(
                        f"{path!r}: stream format changed mid-file "
                        f"({sr} Hz/{ch}ch -> {rate.value} Hz/{channels.value}ch"
                        f"/enc {encoding.value:#x})"
                    )
            elif rc not in (_MPG123_OK, _MPG123_NEED_MORE):
                raise ValueError(
                    f"mpg123 decode error in {path!r}: "
                    f"{lib.mpg123_strerror(h).decode(errors='replace')}"
                )
    finally:
        lib.mpg123_close(h)
        lib.mpg123_delete(h)
    if not chunks:
        raise ValueError(f"no audio frames decoded from {path!r}")
    raw = np.concatenate(chunks)
    x = raw[: raw.size - raw.size % (4 * ch)].view(np.float32)
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return np.ascontiguousarray(x, np.float32), sr
