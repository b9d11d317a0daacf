"""Sequence (context) parallelism: shard TIME over a mesh axis.

The attention family (models/transformer.py) is parallel over time —
its whole-clip training mode (``attn_long``: 30 s clips, no TBPTT) is
exactly the regime where per-device ACTIVATION memory, not weight
memory, sets the batch-size ceiling: a [B, T, H] residual stream plus
per-block attention/MLP intermediates for T≈900 frames. Sharding T over
a ``seq`` mesh axis divides that footprint by the axis size and keeps
every matmul fully dense per device — the TPU-native way to train
longer clips than one chip's HBM can hold.

Like parallel/tp.py this is pure GSPMD: annotate the BATCH with
``P("data", "seq")`` (weights keep the TP layout on "model"), jit, and
let XLA's SPMD partitioner insert the collectives. What the partitioner
does with a time-sharded transformer (the scaling-book context-
parallelism recipe):

- **Attention**: queries stay sharded on their own time shard; K/V are
  all-gathered along ``seq`` (one [B, T, H] all-gather per attention,
  riding ICI) so every query attends over the full causal history. The
  [B, h, T, T] logits stay sharded on the query-time dim — the O(T^2)
  memory term ALSO divides by the axis.
- **Convolutions** over time (the audio encoder, the TCN/critic front
  ends): spatial partitioning with halo exchange — each shard sends its
  kernel-support boundary rows to its neighbor instead of anyone
  gathering the full sequence.
- **cumsum delta integration / per-frame score means**: partitioned
  prefix/reduction collectives.

Sharding annotations never change results; the SP step equals the
single-device step up to reduction order (tests/test_sp.py on the
8-virtual-device mesh, including the composed data x seq x model case).

The RECURRENT family is rejected loudly: a `lax.scan` over time is a
sequential dependence chain — SPMD would have to gather the full
sequence to run it, so "sequence parallelism" would silently degrade to
replication. TBPTT (train/tbptt.py) is that family's long-clip answer.

The reference trains 6 s windows on one CPU and has no concept of any
of this (SURVEY.md §2 parallelism row: DP required, everything else
"not needed at reference scale") — this module, like tp.py, is the
beyond-reference scale-up path the task brief asks for.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import GANConfig
from ..train.config import TrainConfig
from .mesh import DATA_AXIS
from .tp import (
    MODEL_AXIS,
    _force_xla_attention,
    check_tp_divisibility,
    tp_shardings,
)

SEQ_AXIS = "seq"


def make_mesh_3d(
    n_data: int,
    n_seq: int,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """(data x seq x model) mesh over the first n_data*n_seq*n_model
    devices. The model axis is fastest (adjacent devices — per-layer
    psums take the shortest ICI hops), seq next (per-attention K/V
    all-gathers), data slowest (one gradient all-reduce per step)."""
    import numpy as np

    devs = list(devices if devices is not None else jax.devices())
    need = n_data * n_seq * n_model
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_seq, n_model)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def check_sp_family(gan: GANConfig) -> None:
    """SP requires parallel-over-time architectures on BOTH networks.

    The generator must be the attention family; the critic must be
    either the attention critic or the conv-only TCN critic
    (rnn_layers == 0). A recurrent scan under a time-sharded input
    would force a full-sequence gather — replication dressed up as
    parallelism — so the honest behavior is an upfront error."""
    bad = []
    if gan.generator.arch != "transformer":
        bad.append(
            f"generator.arch={gan.generator.arch!r} (needs 'transformer')"
        )
    if gan.discriminator.arch == "rnn" and gan.discriminator.rnn_layers > 0:
        bad.append(
            "discriminator is the recurrent critic (rnn_layers="
            f"{gan.discriminator.rnn_layers}; needs the attention critic "
            "or the TCN critic rnn_layers=0)"
        )
    if bad:
        raise ValueError(
            "sequence parallelism needs parallel-over-time networks — a "
            "lax.scan over a time-sharded sequence degrades to a full "
            "gather: " + "; ".join(bad) + ". Use parallel.dp / "
            "train.tbptt for the recurrent family's long-clip training."
        )


def _batch_sharding(mesh: Mesh) -> NamedSharding:
    # {"feats": [B, T, F], "poses": [B, T, P]}: batch on data, time on seq
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def check_sp_time(t: int, n_seq: int) -> None:
    """jit input shardings need the sharded dim to divide exactly (XLA
    pads only intermediates, never placed arguments). Padding the clip
    here would silently change the objective — the critic averages
    per-frame scores and the GP interpolates every frame — so the
    honest behavior is an upfront error with the fix spelled out."""
    if t % n_seq:
        frame = t - t % n_seq
        raise ValueError(
            f"sequence axis of {n_seq} does not divide the clip's "
            f"{t} frames — pick a clip_seconds whose frame count "
            f"(1 + seconds*feature_rate) is a multiple of {n_seq} "
            f"(e.g. {frame} frames), or use a seq axis that divides {t}"
        )


def sp_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    state,
    donate: bool = True,
    place: bool = True,
):
    """Jitted DP+SP(+TP) train step over a (data, seq[, model]) mesh.

    Returns ``(step_fn, sharded_state)`` exactly like tp.tp_train_step;
    the batch's leading dim shards on "data" and its TIME dim on "seq".
    With seq=1 this IS the TP step; with model=1 (or absent) it is pure
    data x context parallelism. ``place=False`` as in tp_train_step
    (multi-host callers with pre-built global arrays)."""
    from ..train.step import make_train_step

    check_sp_family(gan)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    check_tp_divisibility(gan, n_model)
    gan = _force_xla_attention(gan)
    state_sh = tp_shardings(state, mesh)
    step = make_train_step(gan, tc, axis_name=None, fused=False)
    jitted = jax.jit(
        step,
        in_shardings=(state_sh, _batch_sharding(mesh)),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )
    n_seq = mesh.shape.get(SEQ_AXIS, 1)

    def fn(st, batch):
        check_sp_time(batch["feats"].shape[1], n_seq)
        return jitted(st, batch)

    if place:
        state = jax.device_put(state, state_sh)
    return fn, state


def sp_decode(gan: GANConfig, mesh: Mesh, g_params):
    """Jitted SP batched decode for the attention family: songs shard on
    "data", TIME shards on "seq" — the [B, h, T, T] attention memory
    divides by both axes, so clips longer than one chip's decode ceiling
    run whole. Returns ``(decode_fn, sharded_params)``; decode_fn takes
    (g_params, feats [B,T,F], key, lengths [B]) -> poses [B,T,P]."""
    from ..infer.decode import decode_poses

    check_sp_family(gan)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    check_tp_divisibility(gan, n_model)
    gan = _force_xla_attention(gan)
    p_sh = tp_shardings(g_params, mesh)
    seq2d = _batch_sharding(mesh)
    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def local(params, feats, key, lengths):
        return decode_poses(
            params, gan.generator, feats, key, lengths=lengths, impl="xla"
        )

    jitted = jax.jit(
        local,
        in_shardings=(p_sh, seq2d, repl, data),
        out_shardings=seq2d,
    )
    n_seq = mesh.shape.get(SEQ_AXIS, 1)

    def fn(params, feats, key, lengths):
        check_sp_time(feats.shape[1], n_seq)
        return jitted(params, feats, key, lengths)

    return fn, jax.device_put(g_params, p_sh)
