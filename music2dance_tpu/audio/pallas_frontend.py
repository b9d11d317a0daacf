"""Fused Pallas frontend: waveform -> log-mel (+ MFCC) in one kernel bank.

BASELINE north-star: "the librosa-based audio frontend ... becomes a
single fused Pallas kernel bank producing framed audio features directly
in HBM". The XLA frontend (frontend.py) materializes raw frames
[B, T, n_fft] and the power spectrum [B, T, n_freqs] in HBM; this kernel
keeps both VMEM-resident and writes only the [B, T, n_mels] log-mel (the
~8x-smaller tensor) plus a [B] running max for the top_db clip.

Kernel structure (grid = (B, ceil(T/TB)); sequential on-core):
1. The waveform is pre-padded (reflect, center semantics) and reshaped to
   hop-sized rows [B, R, hop] in XLA. Each grid step DMAs the row slab
   [TB + k - 1, hop] covering its TB frames into VMEM (k = ceil(n_fft/hop)).
2. Overlapping frames are assembled with STATIC slices only: frame j =
   rows j..j+k-1 concatenated — jnp.concatenate of k shifted row-block
   views. No lane-unaligned dynamic slicing (hop need not divide 128).
3. Window-folded real-DFT as two MXU matmuls against constant matrices
   (lane-padded to 128 multiples; padding columns are zero and the mel
   matrix's padded rows are zero, so results are exact).
4. power -> mel matmul -> 10*log10(max(amin, .)) on the VPU.
5. A (1,1) output block revisited across the T-grid accumulates the
   per-clip max (masked for the ragged last block) for top_db clipping.

The DCT + top_db clip + per-clip normalization epilogue runs in XLA on the
small [B, T, n_mels] tensor (the clip max is a cross-block reduction, and
clip-then-DCT does not commute, so it cannot live inside the block loop).

Parity with the numpy oracle at rtol 1e-4 is enforced by
tests/test_pallas_frontend.py (interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .filters import dct_matrix, dft_matrices, mel_filterbank
from .params import AudioConfig

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supports_pallas(cfg: AudioConfig) -> bool:
    """Whether this config is inside the fused kernel's envelope.

    Kernel constraints (each raises below if violated):
    - n_fft <= 9*hop: the row-slab DMA peeks at most 8 rows past the
      block, so a frame may span at most 9 hop-rows;
    - power == 2.0: the kernel hardcodes ``re*re + im*im`` (a general
      power would add a pow on the VPU hot path for a config nothing uses).
    ``jit_extract_features(impl="auto")`` consults this and falls back to
    the XLA frontend instead of raising (round-1 advisor finding).
    """
    return cfg.n_fft <= 9 * cfg.hop_length and cfg.power == 2.0


@functools.lru_cache(maxsize=8)
def _padded_constants(cfg: AudioConfig):
    """Constants in shift-decomposed form, lane-padded to 128 multiples.

    The frame matmul  frames @ C  (frames[j] = wave[j*hop : j*hop+n_fft])
    is rewritten as   sum_p rows_shifted_by_p @ C_p  where C_p holds DFT
    rows [p*hop, p*hop + hop) (zero rows past n_fft). This removes frame
    assembly entirely: the kernel works on hop-width row slabs, whose
    shapes are always aligned, and shifts rows with roll (a supported
    relayout) instead of sub-tile slicing.
    """
    cos_m, sin_m = dft_matrices(cfg)            # [n_fft, n_freqs] float64
    mel = mel_filterbank(cfg)                    # [n_mels, n_freqs]
    hop, n_fft = cfg.hop_length, cfg.n_fft
    k = -(-n_fft // hop)
    nf_pad = _round_up(cfg.n_freqs, 128)

    hop_pad = _round_up(hop, 128)  # DMA lane width must be 128-aligned

    def slabs(m):
        full = np.zeros((k, hop_pad, nf_pad), np.float64)
        for sp in range(k):
            rows = np.arange(hop)
            src = sp * hop + rows
            ok = src < n_fft
            full[sp, rows[ok], : cfg.n_freqs] = m[src[ok]]
        return full.astype(np.float32)

    mel_t = np.pad(mel.T, ((0, nf_pad - cfg.n_freqs), (0, 0))).astype(np.float32)
    return slabs(cos_m), slabs(sin_m), mel_t


def _kernel(wave_ref, cos_ref, sin_ref, mel_ref, logmel_ref, max_ref, seg, sem,
            *, cfg: AudioConfig, tb: int, k: int, t_total: int, rows_pc: int):
    bi = pl.program_id(0)
    i = pl.program_id(1)

    # 1. One aligned DMA: the hop-width row slab [TB + 8, hop] whose row j
    # holds wave[(i*TB + j)*hop : (i*TB + j + 1)*hop]. Offsets/heights are
    # multiples of 8 by construction; the lane dim is the full array width,
    # so the arbitrary hop (735 by default) never violates tiling rules.
    row0 = bi * rows_pc + i * tb
    copy = pltpu.make_async_copy(
        wave_ref.at[pl.ds(row0, tb + 8), :], seg, sem
    )
    copy.start()
    copy.wait()

    # 2-4. Shift-decomposed window-DFT (see _padded_constants) -> power ->
    # mel -> log, all VMEM-resident. roll(-p) aligns row j+p onto row j.
    seg_val = seg[...]
    re = jnp.zeros((tb, cos_ref.shape[2]), jnp.float32)
    im = jnp.zeros((tb, cos_ref.shape[2]), jnp.float32)
    for p in range(k):
        shifted = pltpu.roll(seg_val, (tb + 8 - p) % (tb + 8), 0)[:tb, :]
        re += jnp.dot(shifted, cos_ref[p], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
        im += jnp.dot(shifted, sin_ref[p], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    logmel = 10.0 * jnp.log10(jnp.maximum(cfg.amin, mel))
    logmel_ref[0, :, :] = logmel

    # 5. Per-clip running max, masking rows past the true frame count.
    row = jax.lax.broadcasted_iota(jnp.int32, logmel.shape, 0)
    valid = (row + i * tb) < t_total
    block_max = jnp.max(jnp.where(valid, logmel, -jnp.inf))

    @pl.when(i == 0)
    def _():
        max_ref[bi, 0] = block_max

    @pl.when(i > 0)
    def _():
        max_ref[bi, 0] = jnp.maximum(max_ref[bi, 0], block_max)


def logmel_fused(
    y: jax.Array, cfg: AudioConfig, tb: int = 64, interpret: bool | None = None
) -> tuple[jax.Array, jax.Array]:
    """[B, L] waveform -> (logmel [B, T, n_mels] pre-top_db, clip max [B])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, length = y.shape
    hop, n_fft = cfg.hop_length, cfg.n_fft
    k = -(-n_fft // hop)
    t = cfg.num_frames(length)
    t_pad = _round_up(t, tb)
    n_blocks = t_pad // tb

    if k > 9:
        raise ValueError(
            f"hop_length {hop} too small vs n_fft {n_fft} for the fused "
            "kernel (needs n_fft <= 9*hop); use the XLA frontend"
        )
    if cfg.power != 2.0:
        raise ValueError(
            f"fused kernel computes power=2.0 spectra only, got {cfg.power}; "
            "use the XLA frontend"
        )
    if cfg.center:
        p = n_fft // 2
        y = jnp.pad(y, ((0, 0), (p, p)), mode=cfg.pad_mode)
    hop_pad = _round_up(hop, 128)
    rows_pc = t_pad + 8  # slab row0 multiple of 8; frames peek k-1 <= 8 ahead
    need = rows_pc * hop
    y = jnp.pad(y, ((0, 0), (0, max(0, need - y.shape[1]))))[:, :need]
    # rows carry hop real samples + (hop_pad - hop) zeros; the constant
    # slabs have zero rows there, so the padding is numerically inert
    wave2d = jnp.pad(
        y.reshape(b * rows_pc, hop), ((0, 0), (0, hop_pad - hop))
    )

    cos_p, sin_p, mel_t = _padded_constants(cfg)

    kern = functools.partial(_kernel, cfg=cfg, tb=tb, k=k, t_total=t, rows_pc=rows_pc)
    logmel_pad, clip_max = pl.pallas_call(
        kern,
        grid=(b, n_blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole wave stays in HBM
            pl.BlockSpec(cos_p.shape, lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sin_p.shape, lambda bi, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_t.shape, lambda bi, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tb, cfg.n_mels), lambda bi, i: (bi, i, 0),
                         memory_space=pltpu.VMEM),
            # per-clip scalar maxes live in SMEM (TPU scalar stores cannot
            # target VMEM); whole [B, 1] vector as one resident block
            pl.BlockSpec((b, 1), lambda bi, i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_pad, cfg.n_mels), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tb + 8, hop_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wave2d, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(mel_t))
    return logmel_pad[:, :t], clip_max[:, 0]


def extract_features_pallas(
    y: jax.Array, cfg: AudioConfig = AudioConfig(), tb: int = 64,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in replacement for frontend.extract_features (same contract)."""
    squeeze = y.ndim == 1
    yb = y[None, :] if squeeze else y

    logmel, clip_max = logmel_fused(yb, cfg, tb=tb, interpret=interpret)
    # librosa power_to_db: subtract ref, then clip to (max - top_db).
    ref_term = 10.0 * np.log10(max(cfg.amin, cfg.ref_db))
    logmel = logmel - ref_term
    if cfg.top_db is not None:
        peak = clip_max[:, None, None] - ref_term
        logmel = jnp.maximum(logmel, peak - cfg.top_db)

    if cfg.feature_type == "mfcc":
        dct_t = jnp.asarray(
            np.ascontiguousarray(dct_matrix(cfg.n_mfcc, cfg.n_mels, cfg.dct_norm).T),
            jnp.float32,
        )
        feats = jnp.matmul(logmel, dct_t, precision=_HI)
    elif cfg.feature_type == "logmel":
        feats = logmel
    else:
        raise ValueError(f"unknown feature_type: {cfg.feature_type}")

    if cfg.normalize:
        mean = jnp.mean(feats, axis=-2, keepdims=True)
        var = jnp.var(feats, axis=-2, keepdims=True)
        feats = (feats - mean) * jax.lax.rsqrt(var + cfg.norm_eps)
    return feats[0] if squeeze else feats
