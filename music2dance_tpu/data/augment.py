"""On-device pose augmentation for GAN training.

Small dance corpora train better with geometric augmentation of the real
motion (the reference class universally rotates/mirrors mocap — the
audio→motion mapping is equivariant under rigid transforms of the
skeleton, so the expanded corpus is equally valid). TPU-native form: the
transforms are a few [T, J, 3] matmuls/elementwise ops, so they run
*inside the jitted train step* on the real poses, keyed per example by
global batch index — zero host cost, identical behavior across all three
input modes (raw waves, feature cache, device store) and under DP
(sharded step == single-device step, same guarantee as the z/GP draws in
train/step.py).

Applied to the REAL poses only, before the critic or any aux loss sees
them: this is dataset-level augmentation (the generator learns to cover
the rotated/mirrored corpus), not critic-input augmentation à la
DiffAugment/ADA — the latter transforms both real and fake inside D and
is a different, GAN-stabilization technique.

Evaluation never augments (the Evaluator and evaluate.py build their
batches outside the train step).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..models.configs import JointLayout


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """All off by default (the reference-class objective is untouched).

    - ``rotate``: per example, rotate all joints by a uniform random
      angle about ``up_axis`` (0=X, 1=Y, 2=Z; default Y-up). Requires
      3-D joints. Rotation is about the coordinate origin — center the
      corpus (e.g. BVH ``center_root``) if it carries world offsets.
    - ``mirror``: per example, with probability 1/2, negate coordinate
      ``mirror_axis`` and swap the joints listed in ``mirror_pairs``
      (left/right index pairs of the corpus layout; poses with no
      bilateral pairs can pass ``()`` to only flip the coordinate).
    - ``scale_jitter``: per example, multiply all positions by
      s ~ U[1-a, 1+a].
    - ``noise_std``: i.i.d. Gaussian jitter on every coordinate.
    """

    rotate: bool = False
    up_axis: int = 1
    mirror: bool = False
    mirror_axis: int = 0
    mirror_pairs: Tuple[Tuple[int, int], ...] = ()
    scale_jitter: float = 0.0
    noise_std: float = 0.0

    @property
    def enabled(self) -> bool:
        return (self.rotate or self.mirror or self.scale_jitter > 0.0
                or self.noise_std > 0.0)

    def validate(self, layout: JointLayout) -> None:
        if (self.rotate or self.mirror) and layout.joint_dim != 3:
            raise ValueError(
                "rotate/mirror augmentation needs 3-D joints, layout has "
                f"joint_dim={layout.joint_dim}")
        if self.up_axis not in (0, 1, 2):
            raise ValueError(f"up_axis must be 0/1/2, got {self.up_axis}")
        if self.mirror_axis not in (0, 1, 2):
            raise ValueError(
                f"mirror_axis must be 0/1/2, got {self.mirror_axis}")
        if not 0.0 <= self.scale_jitter < 1.0:
            raise ValueError(
                f"scale_jitter must be in [0, 1), got {self.scale_jitter}")
        for pair in self.mirror_pairs:
            if len(pair) != 2:
                raise ValueError(
                    f"mirror_pairs entries must be (left, right) index "
                    f"pairs, got {pair!r}")
            for idx in pair:
                if not 0 <= idx < layout.n_joints:
                    raise ValueError(
                        f"mirror pair {pair} out of range for "
                        f"{layout.n_joints} joints")


# key-domain tag for the augmentation draw inside the train step — shared
# by train/step.py and train/tbptt.py so both paths derive identical
# per-example keys (pinned by tests/test_augment.py's TBPTT exactness test)
AUG_KEY_TAG = 0xA06


def augment_real_batch(base_key, per_example_keys, b: int, poses, layout,
                       cfg: AugmentConfig):
    """The train-step entry: derive the per-example keys from the step's
    base key (global batch index via ``per_example_keys`` — the sharded
    step equals the single-device step) and augment the real poses."""
    keys = per_example_keys(jax.random.fold_in(base_key, AUG_KEY_TAG), b)
    return augment_poses(keys, poses, layout, cfg)


def _mirror_permutation(cfg: AugmentConfig, n_joints: int):
    perm = list(range(n_joints))
    for a, b in cfg.mirror_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.asarray(perm, jnp.int32)


def augment_poses(keys: jax.Array, poses: jax.Array, layout: JointLayout,
                  cfg: AugmentConfig) -> jax.Array:
    """Jittable: per-example keys [B] x flat poses [B, T, P] -> [B, T, P].

    Key splitting is per transform, so enabling one knob does not change
    another knob's draws.
    """
    if not cfg.enabled:
        return poses
    cfg.validate(layout)
    j, d = layout.n_joints, layout.joint_dim
    perm = _mirror_permutation(cfg, j) if cfg.mirror else None

    def one(key: jax.Array, p: jax.Array) -> jax.Array:
        t = p.shape[0]
        x = p.reshape(t, j, d)
        k_rot, k_mir, k_sc, k_no = jax.random.split(key, 4)
        if cfg.rotate:
            theta = jax.random.uniform(
                k_rot, (), jnp.float32, 0.0, 2.0 * jnp.pi)
            c, s = jnp.cos(theta), jnp.sin(theta)
            a0, a1 = [a for a in range(3) if a != cfg.up_axis]
            rot = jnp.eye(3, dtype=x.dtype)
            rot = rot.at[a0, a0].set(c).at[a0, a1].set(-s)
            rot = rot.at[a1, a0].set(s).at[a1, a1].set(c)
            x = jnp.einsum("tjd,ed->tje", x, rot)
        if cfg.mirror:
            flipped = x[:, perm, :].at[:, :, cfg.mirror_axis].multiply(-1.0)
            x = jnp.where(jax.random.bernoulli(k_mir), flipped, x)
        if cfg.scale_jitter > 0.0:
            s = jax.random.uniform(
                k_sc, (), jnp.float32,
                1.0 - cfg.scale_jitter, 1.0 + cfg.scale_jitter)
            x = x * s.astype(x.dtype)
        if cfg.noise_std > 0.0:
            x = x + cfg.noise_std * jax.random.normal(k_no, x.shape, x.dtype)
        return x.reshape(t, j * d)

    return jax.vmap(one)(keys, poses)
