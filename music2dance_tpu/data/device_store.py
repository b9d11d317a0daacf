"""Device-resident feature store with on-device batch sampling.

The strongest form of "never input-bound" [BASELINE]: when the cached
feature dataset fits in HBM (10 h of audio at the default config is
~400 MB of feats+poses — v5e has 16 GB), the whole dataset lives on
device and each train step SAMPLES its batch on device — random clip
indices + random window starts, gathered with dynamic slices inside the
jitted step. No host->device transfer, no host work, no dispatch latency:
input cost is literally zero and the train loop runs as a device-side
scan (train/sampled.py).

This mirrors the reference's eager preprocess-and-cache design
(SURVEY.md §1) pushed to its TPU-native conclusion.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import AudioConfig


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceFeatureStore:
    """feats [N, Tc, F] + poses [N, Tc, P], clip-aligned, device-resident.

    Clips are padded/truncated to a common length Tc at construction
    (variable-length support via per-clip valid lengths so sampled
    windows never cross into padding).
    """

    feats: jax.Array       # [N, Tc, F]
    poses: jax.Array       # [N, Tc, P]
    lengths: jax.Array     # [N] valid frame counts

    def tree_flatten(self):
        return (self.feats, self.poses, self.lengths), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_clips(cls, clips: list[dict], device=None,
                   min_frames: int = 0) -> "DeviceFeatureStore":
        """clips: [{"feats" [T,F], "pose" [T,P]}] (e.g. PrecomputedFeatureSource).

        ``min_frames``: clips shorter than this are TILED (looped) up to
        it at construction — the same semantics SliceFeatureClip gives
        the streaming feature pipeline, so a corpus of short clips
        trains identically in both cache-backed input modes instead of
        crashing the on-device window sampler with an out-of-range
        dynamic slice.
        """
        t_max = max(min(c["feats"].shape[0], c["pose"].shape[0]) for c in clips)
        t_max = max(t_max, min_frames)
        n = len(clips)
        f_dim = clips[0]["feats"].shape[-1]
        p_dim = clips[0]["pose"].shape[-1]
        feats = np.zeros((n, t_max, f_dim), np.float32)
        poses = np.zeros((n, t_max, p_dim), np.float32)
        lengths = np.zeros((n,), np.int32)
        for i, c in enumerate(clips):
            t = min(c["feats"].shape[0], c["pose"].shape[0], t_max)
            f, p = c["feats"][:t], c["pose"][:t]
            if t < min_frames:  # tile short clips up to the window length
                reps = -(-min_frames // max(t, 1))
                f = np.tile(f, (reps, 1))[:min_frames]
                p = np.tile(p, (reps, 1))[:min_frames]
                t = min_frames
            feats[i, :t] = f
            poses[i, :t] = p
            lengths[i] = t
        put = (lambda x: jax.device_put(x, device)) if device else jax.device_put
        return cls(put(feats), put(poses), put(lengths))

    @classmethod
    def from_source(
        cls,
        source,
        audio: AudioConfig,
        frontend_impl: str = "auto",
        cache_dir: Optional[str] = None,
        device=None,
    ) -> "DeviceFeatureStore":
        from .cache import PrecomputedFeatureSource

        pre = PrecomputedFeatureSource(
            source, audio, frontend_impl=frontend_impl, cache_dir=cache_dir
        )
        return cls.from_clips([pre[i] for i in range(len(pre))], device=device)

    @property
    def n_clips(self) -> int:
        return self.feats.shape[0]

    def sample(self, key: jax.Array, batch_size: int, n_frames: int) -> dict:
        """Jittable random batch: {"feats" [B,n_frames,F], "poses" [B,...]}.

        Uniform over clips, uniform over valid window starts per clip
        (clips shorter than n_frames start at 0 and read into zero pad —
        construction should slice/pad clips >= n_frames for training).
        """
        k_clip, k_start = jax.random.split(key)
        idx = jax.random.randint(k_clip, (batch_size,), 0, self.n_clips)
        max_start = jnp.maximum(self.lengths[idx] - n_frames, 0)
        u = jax.random.uniform(k_start, (batch_size,))
        starts = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
        starts = jnp.minimum(starts, max_start)

        def take(arr, i, s):
            return jax.lax.dynamic_slice_in_dim(arr[i], s, n_frames, axis=0)

        feats = jax.vmap(lambda i, s: take(self.feats, i, s))(idx, starts)
        poses = jax.vmap(lambda i, s: take(self.poses, i, s))(idx, starts)
        return {"feats": feats, "poses": poses}
