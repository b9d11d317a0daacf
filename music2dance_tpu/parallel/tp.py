"""Tensor parallelism for wide models: GSPMD sharding annotations over a
2-D (data x model) mesh.

The reference has no distributed training at all (single-process CPU,
SURVEY.md §2); this module is the TPU-native scale-up path for models too
wide for one chip's HBM or step-time budget. It follows the scaling-book
recipe exactly: pick a mesh, annotate the weight shardings, and let XLA's
SPMD partitioner insert the collectives — no manual collective code, and
the step body (train/step.py) is byte-for-byte the same function that
runs single-device. Sharding annotations never change results; they only
change layout, so the TP step is numerically the single-device step up
to reduction order (tested in tests/test_tp.py on the virtual mesh).

Layout choices (why these specs):

- **Gate matmuls (`hh`, in-scan `ih_l*`) are ROW-parallel**
  (``P("model", None)``: the contraction dim H is sharded). Each device
  computes ``[B, H/d] @ [H/d, G*H]`` and XLA psums the partials — ONE
  reduction of [B, G*H] per layer per timestep, riding ICI. The hidden
  state stays REPLICATED, which matters twice: the gate split
  ``[B, G*H] -> G x [B, H]`` crosses no shard boundary (column-parallel
  gate weights would force a resharding collective at every gate split,
  because the H-sized gate blocks straddle the 3H/d column shards), and
  the scan carry keeps one stable sharding across timesteps.
- **The pose head is the Megatron column->row pair**: `head_fc`
  ``P(None, "model")`` produces a sharded [B, head_hidden/d] activation
  that `head_out` ``P("model", None)`` contracts straight back with a
  single psum — zero intermediate resharding. The TCN critic's
  `tcn_fc`/`score` pair shards the same way.
- **Small weights stay replicated**: encoder convs, `ih0_static`
  (hoisted, [E+Z, G*H]), `ih0_pose` ([pose_dim, G*H] — pose_dim=69 is
  indivisible and tiny), biases of row-parallel layers, and the critic's
  hoisted `ih0`. At width W the sharded weights are the O(W^2) terms;
  the replicated ones are O(W).

The Pallas kernel bank is per-device code: under a model-parallel mesh
the step runs the XLA path (``fused=False``). Data-parallel-only
deployments keep using ``parallel.dp`` (shard_map), where the fused
kernels run shard-locally; this module is for the width regime where the
XLA matmuls are large enough to fill the MXU anyway (measured:
benchmarks/run_width_scaling.py — MFU climbs with width, the fused-
kernel latency advantage shrinks).

Multi-chip perf is not measurable in this container (one real chip); the
specs and collective pattern are validated for correctness on the
8-virtual-device CPU mesh and compile-checked by __graft_entry__.
dryrun_multichip.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import GANConfig
from ..train.config import TrainConfig
from .mesh import DATA_AXIS

MODEL_AXIS = "model"
EXPERT_AXIS = "expert"


def make_mesh_2d(
    n_data: int,
    n_model: int,
    devices=None,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
) -> Mesh:
    """(data x model) mesh over the first n_data*n_model devices.

    The model axis is the FAST axis (adjacent devices) so its per-timestep
    psums ride the shortest ICI hops on a real slice."""
    import numpy as np

    devs = list(devices if devices is not None else jax.devices())
    need = n_data * n_model
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_model)
    return Mesh(grid, (data_axis, model_axis))


def check_tp_divisibility(gan: GANConfig, n_model: int) -> None:
    """Loud validation that the sharded dims divide the model axis.

    GSPMD would pad-and-mask silently; for a training framework the
    honest behavior is an upfront error naming the dim."""
    g, d = gan.generator, gan.discriminator
    bad = []
    if g.hidden_dim % n_model:
        bad.append(f"generator.hidden_dim={g.hidden_dim}")
    if g.head_hidden % n_model:
        bad.append(f"generator.head_hidden={g.head_hidden}")
    if d.hidden_dim % n_model:
        bad.append(f"discriminator.hidden_dim={d.hidden_dim}")
    # attention family: heads shard with the q/k/v column dim, so the
    # head count must split evenly across the model axis
    if g.arch == "transformer" and g.tr_heads % n_model:
        bad.append(f"generator.tr_heads={g.tr_heads}")
    if d.arch == "transformer" and d.tr_heads % n_model:
        bad.append(f"discriminator.tr_heads={d.tr_heads}")
    if bad:
        raise ValueError(
            f"model-parallel axis of {n_model} does not divide: "
            + ", ".join(bad)
            + " — pick widths that are multiples of the model axis"
        )


def check_ep_divisibility(gan: GANConfig, n_expert: int) -> None:
    """Expert parallelism needs a routed generator whose expert count
    splits evenly over the axis (GSPMD would pad-and-mask silently)."""
    if n_expert <= 1:
        return
    g = gan.generator
    if g.arch != "transformer" or g.moe_experts <= 1:
        raise ValueError(
            "expert parallelism needs a generator with MoE blocks "
            f"(arch='transformer', moe_experts > 1; got arch={g.arch!r}, "
            f"moe_experts={g.moe_experts}) — set GeneratorConfig."
            "moe_experts or drop the expert mesh axis"
        )
    if g.moe_experts % n_expert:
        raise ValueError(
            f"expert axis of {n_expert} does not divide "
            f"generator.moe_experts={g.moe_experts} — pick an expert "
            "count that is a multiple of the axis"
        )


# Attention family (models/transformer.py): q/k/v are the Megatron
# column side (heads shard naturally with the output dim), the out
# projection and mlp_out are the row side — one psum per attention and
# per MLP, no intermediate resharding. NOTE: flash attention is a
# per-device Pallas kernel; under a model-parallel mesh the attention
# core must ride the XLA path (attn_impl="xla"), which GSPMD partitions.
_ROW_PARALLEL = ("hh", "head_out", "score", "o", "mlp_out")
_COL_PARALLEL = ("head_fc", "tcn_fc", "q", "k", "v", "mlp_in")


def _module_base(name: str) -> str:
    """scaleN_<base> (multi-scale critic param prefix) -> <base>."""
    if name.startswith("scale") and "_" in name:
        head, rest = name.split("_", 1)
        if head[5:].isdigit():
            return rest
    return name


# MoE expert banks (models/transformer.py MoEMLP): parameters stacked on
# a leading [E, ...] expert dim — the expert-parallel axis shards exactly
# that dim (parallel/ep.py); the router stays replicated (it is O(W)).
_EXPERT_STACKED = ("wi", "bi", "wo", "bo")


def _leaf_spec(path, leaf, axes=(MODEL_AXIS,)) -> P:
    names = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
    if len(names) >= 2 and names[-2] == "moe" and names[-1] in _EXPERT_STACKED:
        if EXPERT_AXIS in axes:
            ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
            return P(EXPERT_AXIS, *([None] * (ndim - 1)))
        return P()
    if len(names) < 2 or names[-1] not in ("kernel", "bias"):
        return P()
    if MODEL_AXIS not in axes:
        return P()
    base = _module_base(names[-2])
    kind = names[-1]
    if base in _ROW_PARALLEL or base.startswith("ih_l"):
        # row-parallel: kernel [H, out] sharded on the contraction dim;
        # bias adds after the psum -> replicated
        return P(MODEL_AXIS, None) if kind == "kernel" else P()
    if base in _COL_PARALLEL:
        # column-parallel: kernel [in, out] and bias sharded on the output
        return P(None, MODEL_AXIS) if kind == "kernel" else P(MODEL_AXIS)
    return P()


def _force_xla_attention(gan: GANConfig) -> GANConfig:
    """Under a model-parallel mesh the attention core must be the XLA
    path (flash attention is a per-device Pallas kernel); GSPMD then
    partitions the einsums, with the logits tensor sharded on heads."""
    import dataclasses

    def fix(cfg):
        if getattr(cfg, "arch", "rnn") == "transformer":
            return dataclasses.replace(cfg, attn_impl="xla")
        return cfg

    return dataclasses.replace(
        gan, generator=fix(gan.generator), discriminator=fix(gan.discriminator)
    )


def tp_specs(tree, axes=(MODEL_AXIS,)) -> Any:
    """PartitionSpec tree for any params-shaped tree (raw params, EMA,
    Adam mu/nu inside optimizer states, whole TrainState): specs are
    derived from each leaf's dict path, which optax and flax.struct
    preserve. ``axes`` filters which named axes may appear (a mesh
    without a "model"/"expert" axis keeps those leaves replicated)."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: _leaf_spec(p, x, axes), tree
    )


def tp_shardings(tree, mesh: Mesh) -> Any:
    axes = tuple(mesh.axis_names)
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _leaf_spec(p, x, axes)), tree
    )


def tp_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    state,
    donate: bool = True,
    place: bool = True,
):
    """Jitted DP+TP train step over a (data, model) mesh.

    Returns ``(step_fn, sharded_state)``: the state is device_put with
    the TP layout (weights sharded on "model", everything replicated on
    "data"); the batch shards its leading dim on "data". One function
    covers both axes — with model=1 this IS GSPMD data parallelism.

    ``place=False`` skips the device_put and returns ``state``
    unchanged — for multi-host callers whose state leaves are already
    GLOBAL arrays built with ``tp_shardings`` layouts
    (jax.make_array_from_process_local_data; a host-local device_put
    cannot target non-addressable devices).
    """
    from ..train.step import make_train_step

    check_tp_divisibility(gan, mesh.shape.get(MODEL_AXIS, 1))
    check_ep_divisibility(gan, mesh.shape.get(EXPERT_AXIS, 1))
    gan = _force_xla_attention(gan)
    state_sh = tp_shardings(state, mesh)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    step = make_train_step(gan, tc, axis_name=None, fused=False)
    fn = jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )
    if place:
        state = jax.device_put(state, state_sh)
    return fn, state


def tp_decode(gan: GANConfig, mesh: Mesh, g_params):
    """Jitted TP batched decode: weights sharded on "model", songs on
    "data". Returns ``(decode_fn, sharded_params)``; decode_fn takes
    (g_params, feats [B,T,F], key, lengths [B]) -> poses."""
    from ..infer.decode import decode_poses

    check_tp_divisibility(gan, mesh.shape.get(MODEL_AXIS, 1))
    check_ep_divisibility(gan, mesh.shape.get(EXPERT_AXIS, 1))
    gan = _force_xla_attention(gan)
    p_sh = tp_shardings(g_params, mesh)
    data = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def local(params, feats, key, lengths):
        # impl="xla": the fused Pallas scan is per-device code; under a
        # model-parallel GSPMD program the decode rides the XLA scan
        return decode_poses(
            params, gan.generator, feats, key, lengths=lengths, impl="xla"
        )

    fn = jax.jit(
        local,
        in_shardings=(p_sh, data, repl, data),
        out_shardings=data,
    )
    return fn, jax.device_put(g_params, p_sh)
