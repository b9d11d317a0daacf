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
BEST_DIR = "best"          # best-by-eval-metric slot (separate from steps/)
BEST_META = "best_meta.json"


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
    t = dict(blob["train"])
    if isinstance(t.get("augment"), dict):
        # nested frozen dataclass: rebuild like layout above (JSON turned
        # the pair tuples into lists; absent in pre-augment checkpoints)
        from ..data.augment import AugmentConfig

        aug = dict(t["augment"])
        aug["mirror_pairs"] = tuple(
            tuple(int(i) for i in p) for p in aug.get("mirror_pairs", ())
        )
        t["augment"] = AugmentConfig(**aug)
    return gan, AudioConfig(**blob["audio"]), TrainConfig(**t)


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
        best_metric: Optional[str] = None,
        best_mode: str = "min",
    ):
        path = os.path.abspath(path)
        os.makedirs(path, exist_ok=True)
        self._path = path
        self._mgr = ocp.CheckpointManager(
            os.path.join(path, "steps"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=True,
            ),
        )
        # Best-by-eval-metric slot: the latest-N GC deletes the checkpoint a
        # user actually wants from a GAN run (the eval_fmd minimum — by 30k
        # steps the step-20k best is long gone at keep=3). One extra managed
        # slot under best/ retains it; best_meta.json records step + value
        # and survives resumes so a restarted run keeps the running best.
        self._best_metric = best_metric
        assert best_mode in ("min", "max")
        self._best_sign = 1.0 if best_mode == "min" else -1.0
        self._best_mgr = None
        self._best = None
        if best_metric is not None:
            self._best_mgr = ocp.CheckpointManager(
                os.path.join(path, BEST_DIR),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1, enable_async_checkpointing=True
                ),
            )
            meta = best_step_info(path)
            if meta is not None and meta.get("metric") == best_metric:
                self._best = float(meta["value"])
        with open(os.path.join(path, CONFIG_FILE), "w") as f:
            f.write(configs_to_json(gan, audio, tc))

    def save(self, step: int, state: TrainState) -> None:
        self._mgr.save(int(step), args=ocp.args.StandardSave(_pack_state(state)))

    def maybe_save_best(self, step: int, state: TrainState,
                        metrics: dict) -> bool:
        """Keep ``state`` in the best/ slot when ``metrics[best_metric]``
        improves on the best seen so far (async, like ``save``). Returns
        whether a save happened. No-op unless the writer was built with
        ``best_metric`` and the key is present and finite."""
        import math

        if self._best_mgr is None or self._best_metric not in metrics:
            return False
        value = float(metrics[self._best_metric])
        if not math.isfinite(value):
            return False
        if self._best is not None and self._best_sign * value >= self._best_sign * self._best:
            return False
        self._best = value
        self._best_mgr.save(
            int(step), args=ocp.args.StandardSave(_pack_state(state)),
            force=True,  # a re-run may revisit an already-managed step number
        )
        meta = {"step": int(step), "metric": self._best_metric, "value": value}
        tmp = os.path.join(self._path, BEST_META + ".tmp")
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, os.path.join(self._path, BEST_META))
        return True

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()
            self._best_mgr.close()

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


def best_step_info(path: str) -> Optional[dict]:
    """{"step", "metric", "value"} of the best/ slot, or None."""
    meta = os.path.join(os.path.abspath(path), BEST_META)
    if not os.path.exists(meta):
        return None
    with open(meta) as f:
        return json.load(f)


def restore_checkpoint(
    path: str, template: TrainState, step: Optional[int | str] = None
) -> TrainState:
    """Restore into the structure of ``template`` (from init_state).

    ``step``: a specific step number from a managed bundle, ``"best"``
    (the best-by-eval-metric slot kept by ``CheckpointWriter``), or
    ``None``/``"latest"`` (the newest step; falls back to the single-slot
    layout when no managed steps exist).
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
    if step == "latest":
        step = None
    if step == "best":
        best_dir = os.path.join(path, BEST_DIR)
        if not os.path.isdir(best_dir):
            raise FileNotFoundError(
                f"{path} has no best/ slot — train with eval enabled "
                "(eval_every > 0) so CheckpointWriter tracks the best "
                "eval metric, or restore a numbered/latest step instead"
            )
        with ocp.CheckpointManager(best_dir) as mgr:
            chosen = sorted(mgr.all_steps())[-1]
            restored = mgr.restore(chosen, args=ocp.args.StandardRestore(abstract))
        return _unpack_state(restored)
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
    path: str, step: Optional[int | str] = None
) -> tuple[GANConfig, AudioConfig, TrainState]:
    """Self-describing restore: rebuild configs + state from disk alone.

    ``step``: forwarded to ``restore_checkpoint`` (number, "best",
    "latest"/None).
    """
    path = os.path.abspath(path)
    with open(os.path.join(path, CONFIG_FILE)) as f:
        gan, audio, tc = configs_from_json(f.read())
    # param shapes don't depend on B/T — a minimal sample batch suffices
    sample = {
        "feats": np.zeros((1, 4, audio.n_features), np.float32),
        "poses": np.zeros((1, 4, gan.generator.pose_dim), np.float32),
    }
    template = init_state(jax.random.key(0), gan, tc, sample)
    return gan, audio, restore_checkpoint(path, template, step=step)
