"""AOT-compiled serving artifacts via jax.export (StableHLO).

A serving process built on ``jit`` pays a trace+compile on first use of
every (batch, length) program — tens of seconds on TPU for the flagship
decoder. ``jax.export`` removes the tracer from the serving path
entirely: the jitted masked decoder is lowered ONCE (here, at packaging
time) to a serialized StableHLO artifact with the generator weights baked
in as constants; a serving process deserializes and calls it without
python model code, flax, or retracing. The artifact is self-contained —
loader needs only jax + the .m2dx file.

Layout of a ``.m2dx`` artifact (a zip):
    decoder.bin    jax.export serialization (StableHLO + baked params)
    meta.json      input/output contract: shapes, dtypes, sample geometry

The exported program is specialized to ONE (batch, frames) shape — the
same static-shape grid discipline as infer/serving.py; export one
artifact per grid point you serve. Cross-platform note: lowering happens
for ``platforms`` (default: the current backend), so export TPU artifacts
from a TPU-attached process.

Reference parity: the reference has no AOT story at all (single-process
research CLI, SURVEY.md §1) — this is the TPU-native serving surface the
task's "production deployment and serving" scope asks for.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from .decode import decode_poses

_FORMAT_VERSION = 1


def export_decoder(
    model,
    batch: int,
    frames: int,
    path: Optional[str] = None,
    platforms: Optional[Sequence[str]] = None,
    impl: str = "auto",
) -> bytes:
    """Package ``model``'s masked decoder for (batch, frames) as a .m2dx blob.

    model: an infer.api.Music2DanceModel (weights are baked into the
        artifact as constants).
    batch/frames: the static shapes the program is specialized to.
    platforms: jax.export lowering platforms (e.g. ["tpu"]); default is
        the current backend.
    impl: decode implementation ("auto" picks the fused Pallas kernel
        when exporting on a TPU backend and the config supports it).

    Returns the artifact bytes; also writes them to ``path`` if given.
    The exported call contract is
        (feats [B,T,F] f32, z [B,noise_dim] f32, lengths [B] i32)
        -> poses [B, T, n_joints, joint_dim] f32.
    """
    cfg = model.gan.generator
    g_params = jax.tree.map(np.asarray, model.g_params)  # freeze as constants

    def run(feats, z, lengths):
        return decode_poses(
            g_params, cfg, feats, None, lengths=lengths, impl=impl, z=z
        )

    f = model.audio.n_features
    args = (
        jax.ShapeDtypeStruct((batch, frames, f), jnp.float32),
        jax.ShapeDtypeStruct((batch, cfg.noise_dim), jnp.float32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
    )
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exported = jax_export.export(jax.jit(run), **kwargs)(*args)

    meta = {
        "format_version": _FORMAT_VERSION,
        "platforms": list(exported.platforms),
        "batch": batch,
        "frames": frames,
        "n_features": f,
        "noise_dim": cfg.noise_dim,
        "n_joints": cfg.layout.n_joints,
        "joint_dim": cfg.layout.joint_dim,
        "sample_rate": model.audio.sample_rate,
        "hop_length": model.audio.hop_length,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("meta.json", json.dumps(meta, indent=1))
        zf.writestr("decoder.bin", bytes(exported.serialize()))
    blob = buf.getvalue()
    if path is not None:
        with open(path, "wb") as fh:
            fh.write(blob)
    return blob


class ExportedDecoder:
    """A deserialized .m2dx artifact: callable, no model code needed.

    __call__(feats [B,T,F], z [B,noise] | None, lengths [B] | None)
        -> poses [B, T, n_joints, joint_dim]
    ``z=None`` draws from ``seed``; ``lengths=None`` marks all frames
    valid. Inputs shorter than the exported (B, T) are zero-padded up to
    it (the exported program is static-shape); outputs are sliced back.
    """

    def __init__(self, blob: bytes):
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            self.meta = json.loads(zf.read("meta.json"))
            if self.meta["format_version"] > _FORMAT_VERSION:
                raise ValueError(
                    f"artifact format {self.meta['format_version']} is newer "
                    f"than this loader ({_FORMAT_VERSION})"
                )
            self._exported = jax_export.deserialize(
                bytearray(zf.read("decoder.bin"))
            )

    @classmethod
    def load(cls, path: str) -> "ExportedDecoder":
        with open(path, "rb") as fh:
            return cls(fh.read())

    def __call__(self, feats, z=None, lengths=None, seed: int = 0):
        m = self.meta
        b_exp, t_exp = m["batch"], m["frames"]
        feats = np.asarray(feats, np.float32)
        b, t, f = feats.shape
        if f != m["n_features"] or b > b_exp or t > t_exp:
            raise ValueError(
                f"feats {feats.shape} incompatible with exported "
                f"({b_exp}, {t_exp}, {m['n_features']})"
            )
        if lengths is None:
            lengths = np.full(b, t, np.int32)
        lengths = np.asarray(lengths, np.int32)
        if z is None:
            z = np.asarray(
                jax.random.normal(jax.random.key(seed), (b, m["noise_dim"]))
            )
        z = np.asarray(z, np.float32)
        if b < b_exp or t < t_exp:
            feats = np.pad(feats, ((0, b_exp - b), (0, t_exp - t), (0, 0)))
            z = np.pad(z, ((0, b_exp - b), (0, 0)))
            lengths = np.pad(lengths, (0, b_exp - b))
        poses = self._exported.call(
            jnp.asarray(feats), jnp.asarray(z), jnp.asarray(lengths)
        )
        return np.asarray(poses)[:b, :t]
