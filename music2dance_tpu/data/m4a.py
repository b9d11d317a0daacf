"""M4A/AAC decode via the system libavformat/libavcodec (native shim).

The reference's ``librosa.load`` covers M4A by delegating to audioread's
ffmpeg backend (SURVEY.md §3.1); this module is that strategy made
explicit: ``native/m2d_avdec.cc`` binds the system libav (ffmpeg 5.x) and
hands back interleaved float32 at the stream's native rate, and this
wrapper does the mono mixdown with the same mean-over-channels semantics
as every other decoder in the package. WAV/FLAC/AIFF stay on the
from-scratch decoders and MP3/Ogg on their dedicated codec bindings —
libav is the fallback for the MP4 family, where reimplementing the box
parser plus AAC DSP buys nothing over the battle-tested system stack.

If the shim cannot be built (no libav dev files or no toolchain),
``avdec_available()`` is False and the loader's loud named-format error
stands (data/wav.py load_wav).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libm2davdec.so")

_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def ensure_native_avdec(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the libav decode shim; None if absent."""
    global _lib, _lib_tried
    if _lib is not None or (_lib_tried and not build):
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and build and os.path.isdir(_NATIVE_DIR):
        import subprocess

        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "avdec"], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if os.path.exists(_LIB_PATH):
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:  # built elsewhere, runtime libav missing here
            return None
        lib.m2d_avdec_decode.restype = ctypes.c_longlong
        lib.m2d_avdec_decode.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        lib.m2d_avdec_free.restype = None
        lib.m2d_avdec_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.m2d_avdec_encode_m4a.restype = ctypes.c_int
        lib.m2d_avdec_encode_m4a.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_longlong,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_char_p,
            ctypes.c_int,
        ]
        _lib = lib
    return _lib


def avdec_available() -> bool:
    return ensure_native_avdec() is not None


def load_m4a(path: str) -> tuple[np.ndarray, int]:
    """Decode an M4A/MP4 (or any libav-supported) file to (mono f32, rate)."""
    lib = ensure_native_avdec()
    if lib is None:
        raise RuntimeError("system libav not available — cannot decode M4A")
    out = ctypes.POINTER(ctypes.c_float)()
    channels = ctypes.c_int(0)
    rate = ctypes.c_int(0)
    errbuf = ctypes.create_string_buffer(256)
    n = lib.m2d_avdec_decode(
        path.encode(), ctypes.byref(out), ctypes.byref(channels),
        ctypes.byref(rate), errbuf, len(errbuf),
    )
    if n < 0:
        raise ValueError(
            f"cannot decode {path!r}: {errbuf.value.decode(errors='replace')}"
        )
    try:
        ch = channels.value
        x = np.ctypeslib.as_array(out, shape=(int(n) * ch,)).copy()
    finally:
        lib.m2d_avdec_free(out)
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return np.ascontiguousarray(x, np.float32), rate.value


def encode_m4a_for_tests(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """TEST-ONLY: write f32 samples ([N] mono or [N, C] interleaved) as
    AAC-LC in an .m4a box (fixture builder for tests/test_m4a.py)."""
    lib = ensure_native_avdec()
    if lib is None:
        raise RuntimeError("system libav not available — cannot encode M4A")
    samples = np.ascontiguousarray(samples, np.float32)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    errbuf = ctypes.create_string_buffer(256)
    rc = lib.m2d_avdec_encode_m4a(
        path.encode(), samples.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, ch, int(sample_rate), errbuf, len(errbuf),
    )
    if rc != 0:
        raise RuntimeError(
            f"m4a encode failed: {errbuf.value.decode(errors='replace')}"
        )
