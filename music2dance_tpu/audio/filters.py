"""Precomputed constant matrices for the audio frontend.

All constants are built once in numpy float64 (bit-matching librosa's own
constant construction, which is also float64 numpy) and cast to float32
when handed to the TPU compute path. The heavy per-frame work — windowing,
rFFT, mel projection, DCT — is then *pure matmuls* against these constants,
which is the MXU-native formulation of the frontend (BASELINE north-star:
"framed audio features directly in HBM").

librosa parity notes (no file:line cites possible — empty reference mount,
SURVEY.md §0; the formulas below follow librosa's public documentation):

- hann window: periodic (``fftbins=True``), 0.5 - 0.5 cos(2 pi n / N).
- mel scale (htk=False): linear below 1 kHz at 200/3 Hz per mel, log above
  with step ln(6.4)/27 — the Slaney/Auditory-Toolbox mapping.
- mel filterbank: triangular overlapping filters on FFT bin frequencies,
  'slaney' area normalization 2 / (f[m+2] - f[m]).
- DCT-II with 'ortho' norm, rows 0..n_mfcc-1.
"""

from __future__ import annotations

import functools

import numpy as np

from .params import AudioConfig


def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic hann window of ``win_length``, centered in ``n_fft`` zeros."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if win_length == n_fft:
        return w
    if win_length > n_fft:
        raise ValueError(f"win_length {win_length} > n_fft {n_fft}")
    # librosa util.pad_center: zero-pad symmetrically to n_fft
    lpad = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float64)
    out[lpad : lpad + win_length] = w
    return out


def hz_to_mel(freqs: np.ndarray, htk: bool = False) -> np.ndarray:
    freqs = np.asarray(freqs, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + freqs / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3.0
    mels = (freqs - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freqs >= min_log_hz
    mels = np.where(
        log_t,
        min_log_mel + np.log(np.maximum(freqs, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels: np.ndarray, htk: bool = False) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3.0
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_frequencies(n_mels: int, fmin: float, fmax: float, htk: bool = False) -> np.ndarray:
    min_mel = hz_to_mel(np.array(fmin), htk=htk)
    max_mel = hz_to_mel(np.array(fmax), htk=htk)
    mels = np.linspace(min_mel, max_mel, n_mels, dtype=np.float64)
    return mel_to_hz(mels, htk=htk)


def mel_filterbank(cfg: AudioConfig) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [n_mels, n_freqs]."""
    n_freqs = cfg.n_freqs
    fftfreqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_freqs, dtype=np.float64)
    mel_f = mel_frequencies(cfg.n_mels + 2, cfg.fmin, cfg.effective_fmax, htk=cfg.htk)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1][:, None]
    upper = ramps[2:] / fdiff[1:][:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if cfg.mel_norm == "slaney":
        enorm = 2.0 / (mel_f[2 : cfg.n_mels + 2] - mel_f[:cfg.n_mels])
        weights = weights * enorm[:, None]
    elif cfg.mel_norm is not None:
        raise ValueError(f"unsupported mel_norm: {cfg.mel_norm}")
    return weights


def dct_matrix(n_mfcc: int, n_mels: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II matrix, shape [n_mfcc, n_mels]: mfcc = D @ logmel."""
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)
    basis = 2.0 * np.cos(np.pi * k[:, None] * (2.0 * n[None, :] + 1.0) / (2.0 * n_mels))
    if norm == "ortho":
        basis *= np.sqrt(1.0 / (2.0 * n_mels))
        basis[0, :] = np.sqrt(1.0 / n_mels)  # ortho DCT-II row 0 is constant
    elif norm is not None:
        raise ValueError(f"unsupported dct norm: {norm}")
    return basis


def dft_matrices(cfg: AudioConfig) -> tuple[np.ndarray, np.ndarray]:
    """Fused window x real-DFT matrices, each shape [n_fft, n_freqs].

    For a raw (un-windowed) frame x of length n_fft:
        re = x @ C,  im = x @ S,  power = re^2 + im^2
    equals ``|rfft(x * window)|^2`` — windowing is folded into the constant
    so the whole STFT power spectrum is a single MXU matmul pair.
    """
    n_fft, n_freqs = cfg.n_fft, cfg.n_freqs
    w = hann_window(cfg.win_length, n_fft)
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(n_freqs, dtype=np.float64)
    ang = 2.0 * np.pi * n[:, None] * k[None, :] / n_fft
    cos_m = np.cos(ang) * w[:, None]
    sin_m = -np.sin(ang) * w[:, None]
    return cos_m, sin_m


@functools.lru_cache(maxsize=8)
def frontend_constants(cfg: AudioConfig):
    """All frontend constant matrices for ``cfg`` as float32 numpy arrays.

    Returns dict with: dft_cos, dft_sin [n_fft, n_freqs]; mel_T
    [n_freqs, n_mels] (transposed for time-major matmul); dct_T
    [n_mels, n_mfcc].
    """
    cos_m, sin_m = dft_matrices(cfg)
    mel = mel_filterbank(cfg)
    dct = dct_matrix(cfg.n_mfcc, cfg.n_mels, cfg.dct_norm)
    return {
        "dft_cos": cos_m.astype(np.float32),
        "dft_sin": sin_m.astype(np.float32),
        "mel_T": np.ascontiguousarray(mel.T).astype(np.float32),
        "dct_T": np.ascontiguousarray(dct.T).astype(np.float32),
    }
