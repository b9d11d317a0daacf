"""Orbax checkpointing of the full training state + configs.

Replaces the reference's torch.save/load of G/D/optimizer state dicts
(SURVEY.md §5): one orbax checkpoint holds {G, D, opt_G, opt_D, step, rng}
plus a JSON sidecar with the GAN/audio/train configs, so a checkpoint is
self-describing and ``Music2DanceModel.from_checkpoint`` can rebuild the
model without external context. Any step is resumable (SURVEY.md §5
failure-recovery row).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..audio import AudioConfig
from ..models.configs import (
    DiscriminatorConfig,
    GANConfig,
    GeneratorConfig,
    JointLayout,
)
from ..train.config import TrainConfig
from ..train.step import TrainState, init_state

CONFIG_FILE = "configs.json"
STATE_DIR = "state"


def configs_to_json(gan: GANConfig, audio: AudioConfig, tc: TrainConfig) -> str:
    return json.dumps(
        {
            "generator": dataclasses.asdict(gan.generator),
            "discriminator": dataclasses.asdict(gan.discriminator),
            "audio": dataclasses.asdict(audio),
            "train": dataclasses.asdict(tc),
            "format_version": 1,
        },
        indent=2,
    )


def configs_from_json(text: str) -> tuple[GANConfig, AudioConfig, TrainConfig]:
    blob = json.loads(text)
    g = dict(blob["generator"])
    d = dict(blob["discriminator"])
    g["layout"] = JointLayout(**g["layout"])
    d["layout"] = JointLayout(**d["layout"])
    gan = GANConfig(
        generator=GeneratorConfig(**g), discriminator=DiscriminatorConfig(**d)
    )
    return gan, AudioConfig(**blob["audio"]), TrainConfig(**blob["train"])


def _pack_state(state: TrainState):
    """TrainState -> plain dict for serialization.

    Typed PRNG keys don't serialize (store raw key data), and OPTIONAL
    fields (ema_g_params) are included only when present — orbax compares
    tree structures by KEY, so packing the dataclass directly would make
    pre-EMA checkpoints unrestorable the moment a field is added (hit in
    round 3 restoring a round-3-early bundle)."""
    d = {
        "step": state.step,
        "g_params": state.g_params,
        "d_params": state.d_params,
        "opt_g": state.opt_g,
        "opt_d": state.opt_d,
        "rng": jax.random.key_data(state.rng),
    }
    if state.ema_g_params is not None:
        d["ema_g_params"] = state.ema_g_params
    return d


def _unpack_state(d) -> TrainState:
    if isinstance(d, TrainState):  # legacy: dataclass-packed checkpoints
        return d.replace(rng=jax.random.wrap_key_data(d.rng))
    return TrainState(
        step=d["step"],
        g_params=d["g_params"],
        d_params=d["d_params"],
        opt_g=d["opt_g"],
        opt_d=d["opt_d"],
        rng=jax.random.wrap_key_data(d["rng"]),
        ema_g_params=d.get("ema_g_params"),
    )


def save_checkpoint(
    path: str,
    state: TrainState,
    gan: GANConfig,
    audio: AudioConfig,
    tc: TrainConfig,
    step: Optional[int] = None,
    max_to_keep: int = 3,
) -> None:
    """Write a checkpoint bundle.

    ``step=None``: single-slot bundle at ``path`` (overwritten each save).
    ``step=N``: managed history under ``path/steps`` — step-numbered,
    garbage-collected to the newest ``max_to_keep`` (production cadence;
    any kept step is resumable — SURVEY.md §5 failure-recovery row).
    """
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    packed = _pack_state(state)
    if step is None:
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.join(path, STATE_DIR), packed, force=True)
    else:
        with ocp.CheckpointManager(
            os.path.join(path, "steps"),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        ) as mgr:
            mgr.save(int(step), args=ocp.args.StandardSave(packed))
    with open(os.path.join(path, CONFIG_FILE), "w") as f:
        f.write(configs_to_json(gan, audio, tc))


class CheckpointWriter:
    """Async step-numbered checkpoint writer (SURVEY.md §5 checkpoint row
    promises *async* save; round-1 blocked the train loop on every write).

    Owns ONE orbax CheckpointManager with async checkpointing enabled:
    ``save()`` returns as soon as the state is snapshotted off the live
    buffers; serialization to disk runs on orbax's background thread while
    training continues. The next ``save()`` (and ``close()``) applies the
    wait-on-previous-save discipline internally. Layout matches
    ``save_checkpoint(step=N)`` — ``restore_checkpoint``/``restore_bundle``
    read both interchangeably.
    """

    def __init__(
        self,
        path: str,
        gan: GANConfig,
        audio: AudioConfig,
        tc: TrainConfig,
        max_to_keep: int = 3,
    ):
        path = os.path.abspath(path)
        os.makedirs(path, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(path, "steps"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
            ),
        )
        with open(os.path.join(path, CONFIG_FILE), "w") as f:
            f.write(configs_to_json(gan, audio, tc))

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(_pack_state(state)))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def checkpoint_steps(path: str) -> list[int]:
    """Steps available in a managed (step-numbered) bundle."""
    steps_dir = os.path.join(os.path.abspath(path), "steps")
    if not os.path.isdir(steps_dir):
        return []
    with ocp.CheckpointManager(steps_dir) as mgr:
        return sorted(mgr.all_steps())


def restore_checkpoint(
    path: str, template: TrainState, step: Optional[int] = None
) -> TrainState:
    """Restore into the structure of ``template`` (from init_state).

    ``step``: a specific step from a managed bundle (default: the latest;
    falls back to the single-slot layout when no managed steps exist).
    """
    path = os.path.abspath(path)
    # explicit sharding on the abstract tree: restores land on the CURRENT
    # default device, so checkpoints written on the TPU restore on a CPU
    # host (and vice versa) instead of failing to find the saving topology
    dev = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=dev),
        _pack_state(template),
    )
    steps = checkpoint_steps(path)
    if step is not None or steps:
        with ocp.CheckpointManager(os.path.join(path, "steps")) as mgr:
            chosen = int(step) if step is not None else steps[-1]
            restored = mgr.restore(chosen, args=ocp.args.StandardRestore(abstract))
    else:
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.join(path, STATE_DIR), abstract)
    return _unpack_state(restored)


def restore_bundle(
    path: str,
) -> tuple[GANConfig, AudioConfig, TrainState]:
    """Self-describing restore: rebuild configs + state from disk alone."""
    path = os.path.abspath(path)
    with open(os.path.join(path, CONFIG_FILE)) as f:
        gan, audio, tc = configs_from_json(f.read())
    # param shapes don't depend on B/T — a minimal sample batch suffices
    sample = {
        "feats": np.zeros((1, 4, audio.n_features), np.float32),
        "poses": np.zeros((1, 4, gan.generator.pose_dim), np.float32),
    }
    template = init_state(jax.random.key(0), gan, tc, sample)
    return gan, audio, restore_checkpoint(path, template)
