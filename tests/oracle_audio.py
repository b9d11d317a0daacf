"""Slow, readable numpy oracle of the librosa feature-extraction chain.

librosa is NOT installed in this container (SURVEY.md §4.1), so this module
is the parity reference for the TPU frontend. It is written independently
of music2dance_tpu.audio (explicit loops, scipy.fft.dct, np.fft.rfft) so a
shared bug cannot silently pass the parity gate. Validate this file against
real librosa the moment it becomes obtainable.

Semantics implemented (librosa documented behavior):
  stft(center=True, window='hann' periodic, pad_mode per config)
  melspectrogram(power=2.0), filters.mel(htk=False, norm='slaney')
  power_to_db(ref=1.0, amin=1e-10, top_db=80) with whole-clip max
  feature.mfcc(dct_type=2, norm='ortho')
"""

from __future__ import annotations

import numpy as np
import scipy.fft

from music2dance_tpu.audio.params import AudioConfig


def oracle_hann(win_length: int) -> np.ndarray:
    # scipy.signal.get_window('hann', N, fftbins=True)
    return np.hanning(win_length + 1)[:-1].astype(np.float64)


def oracle_stft_power(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """[L] -> [T, n_freqs] power spectrogram, frame by frame."""
    y = np.asarray(y, dtype=np.float64)
    win = oracle_hann(cfg.win_length)
    if cfg.win_length < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win_length) // 2
        win = np.concatenate(
            [np.zeros(lpad), win, np.zeros(cfg.n_fft - cfg.win_length - lpad)]
        )
    if cfg.center:
        pad = cfg.n_fft // 2
        y = np.pad(y, pad, mode=cfg.pad_mode)
    n_frames = 1 + (len(y) - cfg.n_fft) // cfg.hop_length
    out = np.empty((n_frames, cfg.n_freqs), dtype=np.float64)
    for t in range(n_frames):
        frame = y[t * cfg.hop_length : t * cfg.hop_length + cfg.n_fft]
        spec = np.fft.rfft(frame * win)
        out[t] = np.abs(spec) ** cfg.power
    return out


def oracle_mel_filterbank(cfg: AudioConfig) -> np.ndarray:
    """[n_mels, n_freqs] slaney-normalized triangular filters, loop-built."""

    def to_mel(f):
        if cfg.htk:
            return 2595.0 * np.log10(1.0 + f / 700.0)
        if f < 1000.0:
            return f / (200.0 / 3.0)
        return 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)

    def to_hz(m):
        if cfg.htk:
            return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
        if m < 15.0:
            return m * (200.0 / 3.0)
        return 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0))

    lo, hi = to_mel(cfg.fmin), to_mel(cfg.effective_fmax)
    pts = np.array([to_hz(m) for m in np.linspace(lo, hi, cfg.n_mels + 2)])
    fftfreqs = np.arange(cfg.n_freqs) * cfg.sample_rate / cfg.n_fft
    fb = np.zeros((cfg.n_mels, cfg.n_freqs), dtype=np.float64)
    for m in range(cfg.n_mels):
        f_lo, f_c, f_hi = pts[m], pts[m + 1], pts[m + 2]
        for k, f in enumerate(fftfreqs):
            if f_lo < f < f_c:
                fb[m, k] = (f - f_lo) / (f_c - f_lo)
            elif f_c <= f < f_hi:
                fb[m, k] = (f_hi - f) / (f_hi - f_c)
            elif f == f_c:
                fb[m, k] = 1.0
        if cfg.mel_norm == "slaney":
            fb[m] *= 2.0 / (f_hi - f_lo)
    return fb


def oracle_power_to_db(s: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    log_spec = 10.0 * np.log10(np.maximum(cfg.amin, s))
    log_spec -= 10.0 * np.log10(np.maximum(cfg.amin, cfg.ref_db))
    if cfg.top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - cfg.top_db)
    return log_spec


def oracle_melspectrogram(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """[L] -> [T, n_mels] (time-major, matching the framework layout)."""
    power = oracle_stft_power(y, cfg)          # [T, n_freqs]
    fb = oracle_mel_filterbank(cfg)            # [n_mels, n_freqs]
    return power @ fb.T


def oracle_mfcc(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """[L] -> [T, n_mfcc] via scipy's DCT (independent of our dct matrix)."""
    logmel = oracle_power_to_db(oracle_melspectrogram(y, cfg), cfg)  # [T, n_mels]
    return scipy.fft.dct(logmel, type=2, norm="ortho", axis=-1)[:, : cfg.n_mfcc]


def oracle_features(y: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """[L] -> [T, F]: the full frontend contract, including normalization."""
    if cfg.feature_type == "mfcc":
        feats = oracle_mfcc(y, cfg)
    elif cfg.feature_type == "logmel":
        feats = oracle_power_to_db(oracle_melspectrogram(y, cfg), cfg)
    else:
        raise ValueError(cfg.feature_type)
    if cfg.normalize:
        mean = feats.mean(axis=0, keepdims=True)
        var = feats.var(axis=0, keepdims=True)
        feats = (feats - mean) / np.sqrt(var + cfg.norm_eps)
    return feats
