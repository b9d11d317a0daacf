"""User-facing inference API: waveform in, pose sequence out.

Mirrors the reference's generate entry point (SURVEY.md §3.3): load
checkpoint -> extract features on the full song -> autoregressively decode
poses -> [T, n_joints, joint_dim] array. Batched multi-song decoding
(config #5) pads to the longest song and masks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import AudioConfig, extract_features
from ..models import GANConfig
from .decode import decode_poses, jit_decoder


class Music2DanceModel:
    """A trained generator bundled with its audio + model configs."""

    def __init__(self, gan: GANConfig, audio: AudioConfig, g_params, seed: int = 0):
        self.gan = gan
        self.audio = audio
        self.g_params = g_params
        self._key = jax.random.key(seed)

    @classmethod
    def from_checkpoint(cls, path: str, seed: int = 0) -> "Music2DanceModel":
        from ..ckpt.orbax_io import restore_bundle

        gan, audio, state = restore_bundle(path)
        return cls(gan, audio, state.g_params, seed=seed)

    def generate(self, waveform: np.ndarray, seed: Optional[int] = None) -> np.ndarray:
        """[L] waveform -> [T, n_joints, joint_dim] pose sequence."""
        feats = extract_features(jnp.asarray(waveform, jnp.float32), self.audio)
        key = self._key if seed is None else jax.random.key(seed)
        poses = jit_decoder(self.gan.generator, masked=False)(
            self.g_params, feats[None], key
        )
        return np.asarray(poses[0])

    def generate_batch(
        self,
        waveforms: Sequence[np.ndarray],
        seed: Optional[int] = None,
    ) -> list[np.ndarray]:
        """Decode many songs concurrently (BASELINE config #5).

        Songs are padded to the longest feature length and decoded in one
        jitted scan; each returned array is cut to its true length.
        """
        feats_list = [
            np.asarray(extract_features(jnp.asarray(w, jnp.float32), self.audio))
            for w in waveforms
        ]
        lengths = np.array([f.shape[0] for f in feats_list], np.int32)
        t_max = int(lengths.max())
        f_dim = feats_list[0].shape[-1]
        padded = np.zeros((len(feats_list), t_max, f_dim), np.float32)
        for i, f in enumerate(feats_list):
            padded[i, : f.shape[0]] = f

        key = self._key if seed is None else jax.random.key(seed)
        poses = jit_decoder(self.gan.generator, masked=True)(
            self.g_params, jnp.asarray(padded), key, jnp.asarray(lengths)
        )
        poses = np.asarray(poses)
        return [poses[i, : lengths[i]] for i in range(len(feats_list))]
