"""Input pipeline: host-side clip assembly overlapped with device compute.

[BASELINE]: "dataloading overlaps raw-waveform decode and feature
extraction with device compute so the GAN step is never input-bound."

Division of labor (TPU-first):
- Host (grain workers): storage read / waveform decode / clip slicing /
  batching — pure python+numpy, parallelizable across worker processes.
- Device: the MFCC frontend. It is a matmul chain (audio/frontend.py), so
  running it on the TPU costs microseconds per batch and rides the same
  async dispatch queue as the train step — XLA overlaps it for free.
- Overlap: ``DevicePrefetcher`` keeps N batches in flight (device_put of
  batch k+1 is issued while step k computes), double-buffering host->HBM
  transfers against compute.

Sources: ``SyntheticClipSource`` (benchmarks/tests), ``NpzClipSource``
(a directory of {wave, pose} .npz files — the on-disk clip format), and
``WavPoseSource`` (paired .wav/.npy files via the native WAV decoder in
music2dance_tpu.data.wav_native when built, numpy fallback otherwise).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Sequence

import grain
import jax
import numpy as np

from ..audio import AudioConfig, jit_extract_features
from ..models.configs import JointLayout


class SyntheticClipSource(grain.sources.RandomAccessDataSource):
    """Deterministic synthetic (wave, pose) clips, generated on demand."""

    def __init__(
        self,
        n_clips: int,
        seconds: float,
        audio: AudioConfig,
        layout: JointLayout,
        seed: int = 0,
    ):
        self._n = n_clips
        self._seconds = seconds
        self._audio = audio
        self._layout = layout
        self._seed = seed

    def __len__(self) -> int:
        return self._n

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng((self._seed, idx))
        n = self._audio.num_samples(self._seconds)
        t = self._audio.num_frames(n)
        wave = (rng.standard_normal(n) * 0.2).astype(np.float32)
        pose = np.tanh(
            np.cumsum(rng.standard_normal((t, self._layout.pose_dim)) * 0.05, axis=0)
        ).astype(np.float32)
        return {"wave": wave, "pose": pose}


class NpzClipSource(grain.sources.RandomAccessDataSource):
    """Directory of .npz clip files with 'wave' [L] and 'pose' [T, P]."""

    def __init__(self, root: str):
        self._paths = sorted(
            os.path.join(root, f) for f in os.listdir(root) if f.endswith(".npz")
        )
        if not self._paths:
            raise FileNotFoundError(f"no .npz clips under {root}")

    def __len__(self) -> int:
        return len(self._paths)

    def __getitem__(self, idx: int) -> dict:
        with np.load(self._paths[idx]) as z:
            return {
                "wave": z["wave"].astype(np.float32),
                "pose": z["pose"].astype(np.float32),
            }


class WavPoseSource(grain.sources.RandomAccessDataSource):
    """Paired song.wav / song.npy files (poses at the feature frame rate)."""

    def __init__(self, root: str):
        from .wav import load_wav  # native decoder with numpy fallback

        self._load_wav = load_wav
        wavs = sorted(f for f in os.listdir(root) if f.endswith(".wav"))
        self._pairs = []
        for w in wavs:
            p = os.path.join(root, w[:-4] + ".npy")
            if os.path.exists(p):
                self._pairs.append((os.path.join(root, w), p))
        if not self._pairs:
            raise FileNotFoundError(f"no paired .wav/.npy clips under {root}")

    def __len__(self) -> int:
        return len(self._pairs)

    def __getitem__(self, idx: int) -> dict:
        wav_path, pose_path = self._pairs[idx]
        wave, _sr = self._load_wav(wav_path)
        pose = np.load(pose_path).astype(np.float32)
        return {"wave": wave, "pose": pose.reshape(pose.shape[0], -1)}


class SliceClip(grain.transforms.RandomMap):
    """Random fixed-length clip slice, aligning pose frames to audio hops.

    Pose frame p covers audio samples [p*hop, (p+1)*hop) (SURVEY.md §2 C2
    rate alignment); slicing picks a pose-frame-aligned window so the
    (wave, pose) pair stays in sync. grain supplies a per-record rng, so
    slices vary across epochs yet the pipeline stays reproducible.
    """

    def __init__(self, seconds: float, audio: AudioConfig):
        self._n_frames = int(round(seconds * audio.feature_rate))
        self._hop = audio.hop_length

    def random_map(self, clip: dict, rng: np.random.Generator) -> dict:
        wave, pose = clip["wave"], clip["pose"]
        t_have = min(pose.shape[0], len(wave) // self._hop)
        t_want = self._n_frames
        if t_have < t_want:
            reps = -(-t_want // max(t_have, 1))
            wave = np.tile(wave, reps)
            pose = np.tile(pose, (reps, 1))
            t_have = t_want
        start = int(rng.integers(0, t_have - t_want + 1))
        return {
            "wave": wave[start * self._hop : (start + t_want) * self._hop],
            "pose": pose[start : start + t_want],
        }


def make_dataset(
    source: grain.sources.RandomAccessDataSource,
    batch_size: int,
    clip_seconds: float,
    audio: AudioConfig,
    seed: int = 0,
    shuffle: bool = True,
    num_workers: int = 0,
) -> grain.IterDataset:
    """grain pipeline: source -> shuffle -> slice -> batch [-> workers]."""
    ds = grain.MapDataset.source(source)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    ds = ds.repeat(None)
    ds = ds.random_map(SliceClip(clip_seconds, audio), seed=seed)
    it = ds.to_iter_dataset()
    it = it.batch(batch_size, drop_remainder=True)
    if num_workers > 0:
        it = it.mp_prefetch(
            grain.MultiprocessingOptions(num_workers=num_workers)
        )
    return it


class DevicePrefetcher:
    """Keeps ``depth`` feature batches in flight on device.

    Pulls host batches, issues async device_put + on-device MFCC
    extraction, and yields {"feats", "poses"} device batches; the device
    work for batch k+1 overlaps the train step on batch k via XLA's async
    dispatch queue.
    """

    def __init__(
        self,
        host_iter: Iterator[dict],
        audio: AudioConfig,
        depth: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        frontend_impl: str = "auto",
    ):
        self._it = iter(host_iter)
        self._extract = jit_extract_features(audio, impl=frontend_impl)
        self._depth = depth
        self._sharding = sharding
        self._queue: list[dict] = []

    def _issue(self) -> Optional[dict]:
        try:
            host = next(self._it)
        except StopIteration:
            return None
        wave = jax.numpy.asarray(host["wave"])
        pose = jax.numpy.asarray(host["pose"])
        if self._sharding is not None:
            wave = jax.device_put(wave, self._sharding)
            pose = jax.device_put(pose, self._sharding)
        # centered STFT yields 1 + L/hop frames; trim to the pose frame
        # count so feats and poses align 1:1 (pose frame p <-> hop p)
        feats = self._extract(wave)[:, : pose.shape[1]]
        return {"feats": feats, "poses": pose}

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        while len(self._queue) < self._depth:
            batch = self._issue()
            if batch is None:
                break
            self._queue.append(batch)
        if not self._queue:
            raise StopIteration
        return self._queue.pop(0)
