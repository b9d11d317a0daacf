"""Audio frontend configuration.

Pins every constant of the librosa-compatible op chain in one place
(SURVEY.md §7 stage 1). The chain — [BASELINE]: STFT (hann window, centered
reflect-padded frames) -> mel filterbank -> log (power_to_db) -> DCT-II
(ortho) -> per-clip normalization — must match librosa at rtol <= 1e-4.

Reference file:line citations are impossible this round (the reference
mount at /root/reference was empty; SURVEY.md §0), so defaults below follow
librosa's documented defaults where [BASELINE] does not pin them, with one
deliberate deviation: ``hop_length=735`` so the feature frame rate is
exactly 30 Hz at sr=22050 — aligning audio features 1:1 with 30 fps pose
sequences (SURVEY.md §2 C2 requires pose-rate/hop-rate alignment).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Constants of the feature extraction chain.

    Attributes mirror librosa parameter names so the parity oracle
    (tests/oracle_audio.py) and the torch converter can be checked
    term-by-term against librosa documentation.
    """

    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 735          # 22050 / 735 = 30 feature frames / sec
    win_length: int = 1024         # <= n_fft; hann window, centered in n_fft
    center: bool = True            # librosa.stft(center=True)
    pad_mode: str = "reflect"      # [BASELINE]: "centered/reflect-padded"
    power: float = 2.0             # melspectrogram on power spectrum
    n_mels: int = 128
    fmin: float = 0.0
    fmax: float | None = None      # None -> sr / 2
    htk: bool = False              # slaney mel scale (librosa default)
    mel_norm: str = "slaney"       # slaney area normalization
    # power_to_db (librosa defaults)
    ref_db: float = 1.0
    amin: float = 1e-10
    top_db: float | None = 80.0
    # MFCC
    n_mfcc: int = 20
    dct_norm: str = "ortho"        # DCT-II, ortho normalized
    # feature selection + per-clip normalization [BASELINE]
    feature_type: str = "mfcc"     # "mfcc" | "logmel"
    normalize: bool = True         # zero-mean / unit-var per feature over time
    norm_eps: float = 1e-8

    @property
    def effective_fmax(self) -> float:
        return float(self.fmax) if self.fmax is not None else self.sample_rate / 2.0

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    @property
    def feature_rate(self) -> float:
        """Feature frames per second of audio."""
        return self.sample_rate / self.hop_length

    @property
    def n_features(self) -> int:
        return self.n_mfcc if self.feature_type == "mfcc" else self.n_mels

    def num_frames(self, num_samples: int) -> int:
        """Frame count of librosa.stft for a waveform of ``num_samples``."""
        if self.center:
            return 1 + num_samples // self.hop_length
        return 1 + (num_samples - self.n_fft) // self.hop_length

    def num_samples(self, seconds: float) -> int:
        return int(round(seconds * self.sample_rate))


DEFAULT_AUDIO = AudioConfig()
