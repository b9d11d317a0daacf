"""Autoregressive motion decoding from audio.

[BASELINE]: "autoregressive motion decoding from an audio clip -> pose
sequences with a fixed joint layout"; the batched variant (64 concurrent
songs) is benchmark config #5.

The generator's scan is autoregressive by construction (its own pose
output is the next step's input), so inference reuses EXACTLY the training
forward — one jitted lax.scan over the whole song, not a python loop of
per-frame calls. Batched songs of different lengths are padded to a common
T and masked; the recurrent scan still runs T steps for every song (XLA
needs static shapes) but invalid frames are zeroed in the output and
excluded from the frames/sec accounting.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import GANConfig, build_generator
from ..models.configs import GeneratorConfig


def decode_poses(
    g_params,
    cfg: GeneratorConfig,
    feats: jax.Array,
    key: Optional[jax.Array],
    lengths: Optional[jax.Array] = None,
    impl: str = "auto",
    z: Optional[jax.Array] = None,
) -> jax.Array:
    """feats [B, T, F] -> poses [B, T, n_joints, joint_dim].

    ``lengths`` [B] marks per-song valid frame counts; frames at t >=
    length are zeroed. ``key`` seeds the per-song latent z (fixed key ->
    deterministic decode, tested in tests/test_infer.py). Alternatively
    pass ``z`` [B, noise_dim] directly (key is then ignored) — the
    serving batcher uses this so each request's latent depends only on
    its own seed, never on which batch it was coalesced into.

    impl "auto" uses the fused Pallas scan kernel on TPU when the config
    supports it (~1.9x frames/sec at batch 64, exact same outputs —
    ops/fused_generator.py); "xla" forces the lax.scan path.
    """
    from ..ops.fused_generator import fused_apply, supports_fused

    b, t, _ = feats.shape
    if z is None:
        z = jax.random.normal(key, (b, cfg.noise_dim), feats.dtype)
    else:
        z = jnp.asarray(z, feats.dtype)
    if (
        impl in ("auto", "fused")
        and jax.default_backend() == "tpu"
        and supports_fused(cfg, interpret=False)
    ):
        poses = fused_apply(g_params, cfg, feats, z, interpret=False)
    else:
        gen = build_generator(cfg)
        poses = gen.apply(g_params, feats, z)  # [B, T, P]
    if lengths is not None:
        mask = jnp.arange(t)[None, :] < lengths[:, None]
        poses = poses * mask[:, :, None].astype(poses.dtype)
    return poses.reshape(b, t, cfg.layout.n_joints, cfg.layout.joint_dim)


@functools.lru_cache(maxsize=8)
def jit_decoder(cfg: GeneratorConfig, masked: bool, with_z: bool = False):
    """Jitted decoder specialized to a generator config.

    ``with_z=True`` takes a precomputed [B, noise_dim] latent instead of a
    PRNG key (per-request-deterministic serving path, infer/serving.py).
    """
    if masked and with_z:
        return jax.jit(
            lambda p, f, z, l: decode_poses(p, cfg, f, None, lengths=l, z=z)
        )
    if masked:
        return jax.jit(
            lambda p, f, k, l: decode_poses(p, cfg, f, k, lengths=l)
        )
    if with_z:
        return jax.jit(lambda p, f, z: decode_poses(p, cfg, f, None, z=z))
    return jax.jit(lambda p, f, k: decode_poses(p, cfg, f, k))


def streaming_decode_step(
    g_params,
    cfg: GeneratorConfig,
    feats_chunk: jax.Array,
    z: jax.Array,
    carry,
):
    """Streaming/chunked decode: [B, Tc, F] chunk + carry -> poses + carry.

    For online generation where audio arrives incrementally; the carry is
    the generator's recurrent state + previous pose (same carry contract
    as TBPTT).
    """
    gen = build_generator(cfg)
    poses, carry = gen.apply(g_params, feats_chunk, z, carry=carry, return_carry=True)
    b, tc = feats_chunk.shape[:2]
    return poses.reshape(b, tc, cfg.layout.n_joints, cfg.layout.joint_dim), carry
