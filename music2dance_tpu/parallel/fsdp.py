"""Fully-sharded data parallelism (ZeRO-3) via GSPMD: parameters,
optimizer moments, and EMA weights shard over the DATA axis.

Plain data parallelism (parallel/dp.py, or tp.py with model=1) keeps a
full replica of every weight, both Adam moments, and the EMA weights on
every device — 5x the parameter bytes per chip, independent of the data
axis size. FSDP removes that: every large float leaf is sharded across
the data axis on its largest divisible dim, so per-device state memory
scales as 1/n_data. XLA's SPMD partitioner inserts the ZeRO-3
collective pattern — all-gather each weight where the forward/backward
needs it, reduce-scatter the gradient straight into the shard that owns
it — from the sharding annotations alone; the step body is the same
``train/step.py`` function that runs single-device, byte for byte.

This follows the scaling-book recipe exactly (mesh + annotations + let
the partitioner place collectives), which is also how maxtext-class
JAX frameworks implement FSDP; there is no wrapper class, no manual
gather/scatter, and no change to results: sharding annotations only
change layout, so the FSDP step equals the single-device step up to
reduction order (tests/test_fsdp.py on the 8-virtual-device mesh).

Layout rule (``fsdp_specs``), applied per leaf on top of the TP/EP
specs from ``tp._leaf_spec``:

- leaves smaller than ``min_size`` elements stay on their base spec —
  LN scales, biases, tiny embeddings are O(W); all-gathering them every
  step would cost latency for no memory win. The sharded leaves are the
  O(W^2) terms, same asymptotics argument as tp.py.
- among dims not already sharded on another axis, shard the LARGEST dim
  divisible by the data-axis size (ties -> first). Largest-dim keeps
  the per-device slice contiguous-ish and guarantees the best memory
  split available for that leaf.
- non-float leaves (step counter, RNG keys) and leaves with no
  divisible free dim stay on their base spec — pure DP for them.

Composition: the base spec comes from the same axis-filtered path rules
as tensor/expert parallelism, so one state tree gets a consistent
layout on any mesh drawn from {data, model, expert}: on (data x model),
a column-parallel kernel [in, out] becomes P("data", "model") — FSDP on
the contraction dim, TP on the output dim, exactly the maxtext
("fsdp", "tensor") layout.

The reference trains on a single CPU process (SURVEY.md §2 parallelism
row: DP required, rest explicitly beyond scope) — FSDP is a
beyond-reference scale-up path for models whose optimizer state does
not fit one chip. Multi-chip perf is unmeasurable in this one-chip
container; what is validated is the sharding program, its collectives
(CPU virtual mesh + driver dryrun), and the per-device memory split
(addressable-shard shapes, tests/test_fsdp.py).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import GANConfig
from ..train.config import TrainConfig
from .mesh import DATA_AXIS
from .tp import (
    _force_xla_attention,
    _leaf_spec,
    check_ep_divisibility,
    check_tp_divisibility,
)

__all__ = [
    "FSDP_MIN_SIZE",
    "fsdp_specs",
    "fsdp_shardings",
    "fsdp_report",
    "fsdp_train_step",
]

# Leaves below this many elements stay replicated (see module docstring).
FSDP_MIN_SIZE = 4096


def _is_float(leaf) -> bool:
    dt = getattr(leaf, "dtype", None)
    if dt is None:
        return False
    try:
        return jax.numpy.issubdtype(dt, jax.numpy.floating)
    except TypeError:
        # extended dtypes (typed RNG keys) are not float
        return False


def _fsdp_leaf_spec(
    path,
    leaf,
    n_fsdp: int,
    axes,
    fsdp_axis: str,
    min_size: int,
) -> P:
    base = _leaf_spec(path, leaf, axes)
    shape = tuple(getattr(leaf, "shape", ()))
    if n_fsdp <= 1 or not shape or not _is_float(leaf):
        return base
    if int(np.prod(shape)) < min_size:
        return base
    spec = list(base) + [None] * (len(shape) - len(base))
    free = [i for i, d in enumerate(shape) if spec[i] is None and d % n_fsdp == 0]
    if not free:
        return base
    dim = max(free, key=lambda i: shape[i])
    spec[dim] = fsdp_axis
    return P(*spec)


def fsdp_specs(
    tree,
    n_fsdp: int,
    axes=(),
    fsdp_axis: str = DATA_AXIS,
    min_size: int = FSDP_MIN_SIZE,
) -> Any:
    """PartitionSpec tree for any params-shaped tree (raw params, EMA,
    Adam mu/nu inside optimizer states, whole TrainState). ``axes`` are
    the OTHER mesh axes whose TP/EP specs form the base layout; the
    fsdp axis is added on top per the module-docstring rule."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _fsdp_leaf_spec(p, x, n_fsdp, axes, fsdp_axis, min_size),
        tree,
    )


def fsdp_shardings(
    tree,
    mesh: Mesh,
    fsdp_axis: str = DATA_AXIS,
    min_size: int = FSDP_MIN_SIZE,
) -> Any:
    n_fsdp = mesh.shape.get(fsdp_axis, 1)
    axes = tuple(a for a in mesh.axis_names if a != fsdp_axis)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        fsdp_specs(tree, n_fsdp, axes, fsdp_axis, min_size),
    )


def fsdp_report(tree, n_fsdp: int, axes=(), fsdp_axis: str = DATA_AXIS,
                min_size: int = FSDP_MIN_SIZE) -> dict:
    """Memory accounting for a layout: total float bytes, bytes sharded
    on the fsdp axis, and the resulting per-device fraction (1.0 = pure
    DP replication; 1/n_fsdp = everything sharded)."""
    specs = fsdp_specs(tree, n_fsdp, axes, fsdp_axis, min_size)
    total = 0
    sharded = 0
    for leaf, spec in zip(jax.tree_util.tree_leaves(tree),
                          jax.tree_util.tree_leaves(specs, is_leaf=lambda x: isinstance(x, P))):
        if not _is_float(leaf):
            continue
        b = leaf.size * leaf.dtype.itemsize
        total += b
        if fsdp_axis in tuple(spec):
            sharded += b
    per_device = (total - sharded) + sharded / max(n_fsdp, 1)
    return {
        "total_bytes": int(total),
        "sharded_bytes": int(sharded),
        "sharded_frac": sharded / total if total else 0.0,
        "per_device_frac": per_device / total if total else 1.0,
    }


def fsdp_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    state,
    donate: bool = True,
    place: bool = True,
    min_size: int = FSDP_MIN_SIZE,
):
    """Jitted FSDP train step over a mesh with a data axis (optionally
    also model/expert axes — FSDP composes with TP/EP).

    Returns ``(step_fn, sharded_state)``: weights, Adam moments, and EMA
    shard over the data axis (ZeRO-3), the batch shards its leading dim
    over the same axis. ``place=False`` skips the device_put for
    multi-host callers whose state is already global (see
    tp.tp_train_step)."""
    from ..train.step import make_train_step

    gan = _force_xla_attention(gan)
    return _fsdp_jit(
        gan, tc, mesh, state,
        make_train_step(gan, tc, axis_name=None, fused=False),
        donate=donate, place=place, min_size=min_size,
    )


def fsdp_tbptt_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    state,
    donate: bool = True,
    place: bool = True,
    min_size: int = FSDP_MIN_SIZE,
):
    """FSDP over the TBPTT step: long-clip window-scan training with
    weights/Adam moments/EMA sharded over the data axis. Same GSPMD
    construction as fsdp_train_step — the TBPTT step is pure (state,
    batch) -> (state, metrics), so the sharding annotations compose with
    the window scan untouched (equivalence: tests/test_fsdp.py)."""
    from ..train.tbptt import make_tbptt_train_step

    gan = _force_xla_attention(gan)
    return _fsdp_jit(
        gan, tc, mesh, state,
        make_tbptt_train_step(gan, tc, axis_name=None, fused=False),
        donate=donate, place=place, min_size=min_size,
    )


def _fsdp_jit(gan, tc, mesh, state, step, donate, place, min_size):
    if mesh.shape.get(DATA_AXIS, 1) <= 1:
        raise ValueError(
            "FSDP shards over the data axis; this mesh has no data axis "
            f"(axes {mesh.axis_names}) — use tp_train_step for pure "
            "model parallelism"
        )
    check_tp_divisibility(gan, mesh.shape.get("model", 1))
    check_ep_divisibility(gan, mesh.shape.get("expert", 1))
    state_sh = fsdp_shardings(state, mesh, min_size=min_size)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    fn = jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )
    if place:
        state = jax.device_put(state, state_sh)
    return fn, state
