"""Sample-rate conversion: kaiser-windowed sinc polyphase resampler.

The reference loads audio with ``librosa.load(path, sr)``, which resamples
any input to the model rate (SURVEY.md §3.1); round 1 shipped without this
and hard-errored on rate mismatch (VERDICT missing #2). This module is the
framework's own implementation — host-side (it lives in the data pipeline
next to the WAV decode, overlapping device compute), with the hot MAC loop
in native C++ (native/m2d_resample.cc via ctypes) and a vectorized numpy
fallback with identical semantics (cross-checked in tests/test_resample.py
against each other and against an analytic bandlimited-sine oracle).

Method: rational-ratio polyphase — upsample by L (zero-stuffing), FIR
lowpass at ``rolloff * min(sr_in, sr_out) / 2``, downsample by M, evaluated
directly as

    out[j] = sum_i  y[i] * h[j*M - i*L + half]

so no zero-stuffed signal is ever materialized. The filter is a kaiser-
windowed sinc (quality defaults comparable to resampy's kaiser_best:
64 zero crossings, beta 14.77, rolloff 0.9475 — ~ -100 dB stopband).
Edges are zero-padded; output length is ``ceil(n * sr_out / sr_in)``
(librosa's convention).
"""

from __future__ import annotations

import functools
import math

import numpy as np

NUM_ZEROS = 64
BETA = 14.769656459379492
ROLLOFF = 0.9475


@functools.lru_cache(maxsize=32)
def _design(L: int, M: int, num_zeros: int, beta: float, rolloff: float) -> np.ndarray:
    """Lowpass FIR for the L-up / M-down polyphase, gain-corrected by L.

    In the upsampled domain (rate ``sr_in * L``) the passband must end at
    ``rolloff * min(sr_in, sr_out) / 2``, i.e. normalized cutoff
    ``rolloff / max(L, M)``; ``num_zeros`` sinc zero-crossings at that
    cutoff give ``half = num_zeros * max(L, M)`` taps per side.
    """
    m = max(L, M)
    half = num_zeros * m
    n = np.arange(-half, half + 1, dtype=np.float64)
    fc = rolloff / m
    h = fc * np.sinc(fc * n)
    h *= np.kaiser(2 * half + 1, beta)
    return (h * L).astype(np.float32)


def resample_numpy(
    y: np.ndarray,
    sr_in: int,
    sr_out: int,
    num_zeros: int = NUM_ZEROS,
    beta: float = BETA,
    rolloff: float = ROLLOFF,
    chunk: int = 1 << 16,
) -> np.ndarray:
    """Pure-numpy polyphase evaluation (chunked gather + weighted sum)."""
    if sr_in == sr_out:
        return np.asarray(y, np.float32)
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    h = _design(L, M, num_zeros, beta, rolloff)
    half = len(h) // 2
    n_in = len(y)
    n_out = -(-n_in * L // M)  # ceil
    y = np.asarray(y, np.float32)

    # per output j, contributing inputs i span ceil((j*M - half)/L) ..
    # floor((j*M + half)/L): at most K of them
    K = 2 * half // L + 1
    out = np.empty(n_out, np.float32)
    k = np.arange(K)
    for j0 in range(0, n_out, chunk):
        j = np.arange(j0, min(j0 + chunk, n_out))
        i0 = -((half - j * M) // L)  # ceil((j*M - half) / L)
        i = i0[:, None] + k[None, :]
        tap = j[:, None] * M - i * L + half
        valid = (i >= 0) & (i < n_in) & (tap >= 0) & (tap <= 2 * half)
        yi = np.where(valid, y[np.clip(i, 0, n_in - 1)], 0.0)
        w = np.where(valid, h[np.clip(tap, 0, 2 * half)], 0.0)
        out[j] = np.einsum("jk,jk->j", yi, w)
    return out


def resample_native(
    y: np.ndarray,
    sr_in: int,
    sr_out: int,
    num_zeros: int = NUM_ZEROS,
    beta: float = BETA,
    rolloff: float = ROLLOFF,
):
    """Native C++ polyphase loop; returns None if the library is missing."""
    from ..data.wav import ensure_native

    lib = ensure_native()
    if lib is None or not hasattr(lib, "m2d_resample"):
        return None
    if sr_in == sr_out:
        return np.asarray(y, np.float32)
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    h = _design(L, M, num_zeros, beta, rolloff)
    y = np.ascontiguousarray(y, np.float32)
    n_out = -(-len(y) * L // M)
    out = np.empty(n_out, np.float32)

    import ctypes

    fp = ctypes.POINTER(ctypes.c_float)
    rc = lib.m2d_resample(
        y.ctypes.data_as(fp), ctypes.c_long(len(y)),
        ctypes.c_long(L), ctypes.c_long(M),
        h.ctypes.data_as(fp), ctypes.c_long(len(h)),
        out.ctypes.data_as(fp), ctypes.c_long(n_out),
    )
    if rc != 0:
        return None
    return out


def resample(y: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Resample mono float32 ``y`` from ``sr_in`` to ``sr_out`` Hz."""
    if sr_in == sr_out:
        return np.asarray(y, np.float32)
    native = resample_native(y, sr_in, sr_out)
    if native is not None:
        return native
    return resample_numpy(y, sr_in, sr_out)
