"""Train step with on-device batch sampling from a DeviceFeatureStore.

``step(state) -> (state, metrics)`` — the batch is sampled inside the
jitted step (zero host involvement), so K steps fuse into one lax.scan
with no input boundary at all. This is the production training mode when
the cached feature dataset fits in HBM (data/device_store.py).

DP: the store is replicated; each shard samples its own local batch with
an axis-decorrelated key, and gradients pmean as usual — statistically
identical to sharding a globally-sampled batch.
"""

from __future__ import annotations

from typing import Optional

import jax

from ..data.device_store import DeviceFeatureStore
from ..models import GANConfig
from .config import TrainConfig
from .step import TrainState, make_train_step


def make_sampling_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    store: DeviceFeatureStore,
    n_frames: int,
    axis_name: Optional[str] = None,
    num_shards: int = 1,
):
    """``tc.batch_size`` is the GLOBAL batch in every input mode: under
    DP each shard samples batch_size / num_shards clips (round-1 advisor
    finding: device_store mode silently trained on batch_size * N)."""
    if tc.batch_size % num_shards != 0:
        raise ValueError(
            f"global batch {tc.batch_size} not divisible by {num_shards} shards"
        )
    inner = make_train_step(gan, tc, axis_name=axis_name)
    local_batch = tc.batch_size // num_shards

    def step(state: TrainState):
        key = jax.random.fold_in(
            jax.random.fold_in(state.rng, state.step), 0x5A17
        )
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        batch = store.sample(key, local_batch, n_frames)
        return inner(state, batch)

    return step


def shard_sampling_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    store: DeviceFeatureStore,
    n_frames: int,
    mesh,
    axis_name: str = "data",
    donate: bool = True,
):
    """DP variant: each shard samples batch_size / mesh.size clips."""
    from jax.sharding import PartitionSpec as P

    step = make_sampling_train_step(
        gan, tc, store, n_frames, axis_name=axis_name, num_shards=mesh.size
    )
    sharded = jax.shard_map(
        step, mesh=mesh, in_specs=(P(),), out_specs=(P(), P()), check_vma=False
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
