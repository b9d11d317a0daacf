"""Preprocess-time feature caching.

The reference's frontend runs "eagerly at preprocess time, cached to disk"
(SURVEY.md §1 control flow) — this is the TPU-native version: features for
whole clips are extracted ON DEVICE in large batches once, cached (RAM or
.npz dir), and training then streams [T, F] feature windows instead of raw
waveforms.

Why it matters here: a batch-32 of 6 s raw waveforms is ~17 MB; its MFCC
features are ~0.46 MB (36x less). On hosts where the host->device link is
the bottleneck (this container's TPU tunnel moves ~50 MB/s), shipping
features instead of waveforms is the difference between input-bound and
compute-bound training (benchmarks/run_pipeline.py quantifies it).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import grain
import jax
import numpy as np

from ..audio import AudioConfig, jit_extract_features

MANIFEST = "manifest.json"


def _manifest(audio: AudioConfig, n_clips: int) -> dict:
    return {"audio": dataclasses.asdict(audio), "n_clips": n_clips,
            "format_version": 1}


class PrecomputedFeatureSource(grain.sources.RandomAccessDataSource):
    """Wraps a (wave, pose) clip source; yields {feats [T,F], pose [T,P]}.

    Extraction happens once, on device, in batches of equal-length clips
    (clips are bucketed by length so each unique length compiles once).
    ``cache_dir`` persists the features as .npz for later runs.
    """

    def __init__(
        self,
        source,
        audio: AudioConfig,
        batch_size: int = 16,
        frontend_impl: str = "auto",
        cache_dir: Optional[str] = None,
    ):
        self._clips: list[dict] = []
        if cache_dir is not None and os.path.isdir(cache_dir) and os.listdir(cache_dir):
            # a cache is only reusable for the SAME audio config + corpus
            # size — a stale cache from another run silently yields wrong
            # features otherwise (round-1 advisor finding)
            mpath = os.path.join(cache_dir, MANIFEST)
            if not os.path.exists(mpath):
                raise ValueError(
                    f"feature cache {cache_dir!r} has no {MANIFEST}; refusing "
                    "to load an unidentified cache — delete it to rebuild"
                )
            with open(mpath) as f:
                found = json.load(f)
            want = _manifest(audio, len(source))
            if found != want:
                raise ValueError(
                    f"feature cache {cache_dir!r} was built with a different "
                    f"audio config or corpus (cache: {found}, expected: "
                    f"{want}); delete it to rebuild"
                )
            for f in sorted(os.listdir(cache_dir)):
                if f.endswith(".npz"):
                    with np.load(os.path.join(cache_dir, f)) as z:
                        self._clips.append(
                            {"feats": z["feats"].copy(), "pose": z["pose"].copy()}
                        )
            return

        extract = jit_extract_features(audio, impl=frontend_impl)
        by_len: dict[int, list[tuple[int, dict]]] = {}
        n = len(source)
        for i in range(n):
            clip = source[i]
            by_len.setdefault(len(clip["wave"]), []).append((i, clip))

        feats_by_idx: dict[int, np.ndarray] = {}
        poses_by_idx: dict[int, np.ndarray] = {}
        for clips in by_len.values():
            for start in range(0, len(clips), batch_size):
                chunk = clips[start : start + batch_size]
                waves = np.stack([c["wave"] for _, c in chunk])
                feats = np.asarray(extract(waves))
                for (idx, c), f in zip(chunk, feats):
                    t = min(c["pose"].shape[0], f.shape[0])
                    feats_by_idx[idx] = f[:t]
                    poses_by_idx[idx] = c["pose"][:t]
        self._clips = [
            {"feats": feats_by_idx[i], "pose": poses_by_idx[i]} for i in range(n)
        ]

        if cache_dir is not None:
            os.makedirs(cache_dir, exist_ok=True)
            for i, c in enumerate(self._clips):
                np.savez(
                    os.path.join(cache_dir, f"clip{i:06d}.npz"),
                    feats=c["feats"], pose=c["pose"],
                )
            with open(os.path.join(cache_dir, MANIFEST), "w") as f:
                json.dump(_manifest(audio, len(source)), f)

    def __len__(self) -> int:
        return len(self._clips)

    def __getitem__(self, idx: int) -> dict:
        return self._clips[idx]


class SliceFeatureClip(grain.transforms.RandomMap):
    """Random T-frame window over cached (feats, pose) — both already at
    the feature frame rate, so one index slices both in lockstep."""

    def __init__(self, seconds: float, audio: AudioConfig):
        self._n_frames = int(round(seconds * audio.feature_rate))

    def random_map(self, clip: dict, rng: np.random.Generator) -> dict:
        feats, pose = clip["feats"], clip["pose"]
        t_have = min(feats.shape[0], pose.shape[0])
        t_want = self._n_frames
        if t_have < t_want:
            reps = -(-t_want // max(t_have, 1))
            feats = np.tile(feats, (reps, 1))
            pose = np.tile(pose, (reps, 1))
            t_have = feats.shape[0]
        start = int(rng.integers(0, t_have - t_want + 1))
        return {
            "feats": feats[start : start + t_want],
            "poses": pose[start : start + t_want],
        }


def make_feature_dataset(
    source,
    batch_size: int,
    clip_seconds: float,
    audio: AudioConfig,
    seed: int = 0,
    shuffle: bool = True,
    num_workers: int = 0,
    frontend_impl: str = "auto",
    cache_dir: Optional[str] = None,
    precomputed: bool = False,
) -> grain.IterDataset:
    """Feature-domain pipeline: precompute -> shuffle -> slice -> batch.

    ``precomputed``: ``source`` already yields {"feats", "pose"} (a
    PrecomputedFeatureSource or a SubsetSource view of one) — skip the
    extraction wrap. This is how a train/val split made AFTER caching
    (so the cache manifest still matches the full preprocess.py corpus)
    feeds the training side.
    """
    if precomputed:
        pre = source
    else:
        pre = PrecomputedFeatureSource(
            source, audio, frontend_impl=frontend_impl, cache_dir=cache_dir
        )
    ds = grain.MapDataset.source(pre)
    if shuffle:
        ds = ds.shuffle(seed=seed)
    ds = ds.repeat(None)
    ds = ds.random_map(SliceFeatureClip(clip_seconds, audio), seed=seed)
    it = ds.to_iter_dataset()
    it = it.batch(batch_size, drop_remainder=True)
    if num_workers > 0:
        it = it.mp_prefetch(grain.MultiprocessingOptions(num_workers=num_workers))
    return it
