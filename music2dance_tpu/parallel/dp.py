"""Data-parallel training via shard_map over the ``data`` mesh axis.

The train step body (music2dance_tpu.train.step) is written with an
optional ``axis_name``: gradients/metrics are ``lax.pmean``-ed inside, and
per-example randomness is derived from GLOBAL example indices, so the
sharded step is numerically equivalent to the single-device step on the
concatenated batch (the SURVEY.md §4.6 grad-allreduce equivalence test).

State stays replicated (P()); the batch is sharded on its leading axis.
Collectives ride ICI on a real TPU mesh; the same code runs on the 8
virtual CPU devices used in tests.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..models import GANConfig
from ..train.config import TrainConfig
from ..train.step import make_train_step
from .mesh import DATA_AXIS


def shard_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    donate: bool = True,
):
    """Jitted DP train step: (replicated state, batch-sharded batch) -> same."""
    step = make_train_step(gan, tc, axis_name=axis_name)
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,  # pmean-ed outputs are replicated by construction
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def shard_tbptt_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    axis_name: str = DATA_AXIS,
    donate: bool = True,
):
    """DP over the TBPTT step: long clips sharded on batch, gradients
    pmean-ed inside every window update (BASELINE config #4 at scale)."""
    from ..train.tbptt import make_tbptt_train_step

    step = make_tbptt_train_step(gan, tc, axis_name=axis_name)
    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def shard_decode(gan: GANConfig, mesh: Mesh, axis_name: str = DATA_AXIS):
    """DP batched autoregressive decode: songs sharded across the mesh.

    Decoding is embarrassingly parallel over songs (no collectives); the
    mesh just multiplies frames/sec (BASELINE config #5 at scale).
    Returns jitted (g_params, feats [B,T,F], key, lengths [B]) -> poses.
    """
    from ..infer.decode import decode_poses

    def local(g_params, feats, key, lengths):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        return decode_poses(g_params, gan.generator, feats, key, lengths=lengths)

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)
