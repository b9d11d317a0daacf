"""Expert parallelism: shard the MoE expert banks over a mesh axis.

The attention family's MoE blocks (models/transformer.py MoEMLP) stack
every expert parameter on a leading ``[E, ...]`` dim. Expert parallelism
shards exactly that dim over an ``expert`` mesh axis: each device holds
``E / n_expert`` experts' weights and computes only their slots of the
``[E, B, C, D]`` expert workspace — weight memory AND expert FLOPs both
divide by the axis, which is the whole point of MoE scaling (capacity
grows with E at constant per-token FLOPs, and EP keeps per-device memory
constant as E grows).

Like tp.py/sp.py this is pure GSPMD (the scaling-book recipe): the
expert-stacked leaves get ``P("expert", ...)`` (tp._leaf_spec knows the
MoE leaf names), the dispatch/combine einsums' ``[E, ...]`` operands and
results shard on the expert dim, and XLA's SPMD partitioner inserts the
token movement — the all-to-all-shaped collectives of the GShard recipe
— with no manual collective code. The router (O(W) params) and every
non-expert weight stay on their TP layout (replicated on "expert").

Composition: the spec derivation is axis-filtered, so one params tree
gets a consistent layout on ANY mesh drawn from {data, seq, model,
expert} — ``ep_train_step`` is literally ``tp.tp_train_step`` run on a
mesh that has an expert axis, validated by ``check_ep_divisibility``.

Equivalence: sharding annotations never change results — the EP step
equals the single-device MoE step up to reduction order
(tests/test_ep.py on the 8-virtual-device mesh, including the composed
data x expert x model case). Multi-chip perf is unmeasurable in this
one-chip container; what is validated is the sharding program and its
collectives, the same caveat as tp.py/sp.py.

The reference trains a dense recurrent model on one CPU (SURVEY.md §2
parallelism row) — MoE and EP are beyond-reference scale-up paths.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from .mesh import DATA_AXIS
from .tp import (
    EXPERT_AXIS,
    MODEL_AXIS,
    check_ep_divisibility,
    tp_decode,
    tp_train_step,
)

__all__ = [
    "EXPERT_AXIS",
    "make_mesh_ep",
    "check_ep_divisibility",
    "ep_train_step",
    "ep_decode",
]


def make_mesh_ep(
    n_data: int,
    n_expert: int,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """(data x expert[ x model]) mesh over the first
    ``n_data * n_expert * n_model`` devices. The model axis (when used)
    is fastest — its per-layer psums take the shortest ICI hops; expert
    next (per-block dispatch/combine); data slowest (one gradient
    all-reduce per step)."""
    import numpy as np

    devs = list(devices if devices is not None else jax.devices())
    need = n_data * n_expert * n_model
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    if n_model > 1:
        grid = np.asarray(devs[:need]).reshape(n_data, n_expert, n_model)
        return Mesh(grid, (DATA_AXIS, EXPERT_AXIS, MODEL_AXIS))
    grid = np.asarray(devs[:need]).reshape(n_data, n_expert)
    return Mesh(grid, (DATA_AXIS, EXPERT_AXIS))


# The step/decode builders are the axis-filtered GSPMD path shared with
# tensor parallelism: on an expert-carrying mesh tp_shardings lays the
# expert-stacked leaves on "expert" and everything else on its TP spec.
ep_train_step = tp_train_step
ep_decode = tp_decode
