"""Pipeline parallelism: the attention generator's blocks over a
``stage`` mesh axis, GPipe-scheduled inside shard_map.

The attention family stacks identical pre-LN blocks
(models/transformer.py TransformerBlock); at depth the O(W^2) block
weights dominate the footprint. Pipeline parallelism puts
``tr_blocks / n_stage`` consecutive blocks on each device of a
``stage`` axis and streams MICROBATCHES through them: while stage 1
runs microbatch m, stage 0 already runs m+1 — compute overlaps across
stages, weight memory divides by the axis, and the only traffic is one
[mb, T, H] activation hop per stage boundary per microbatch, riding
ICI neighbor links (``lax.ppermute``).

Unlike tp/sp/ep (GSPMD annotations) this is explicit SPMD: GPipe's
schedule is a software pipeline the partitioner cannot invent, so the
block loop runs inside ``jax.shard_map`` as a ``lax.scan`` over
``n_micro + n_stage - 1`` ticks. Each tick every stage (a) picks its
input — stage 0 reads the next microbatch, stage s>0 reads the
activation its neighbor sent last tick — (b) runs its local blocks
(a ``lax.scan`` over the stacked per-stage block params), and (c)
ppermutes the result one stage forward. Ramp-up/ramp-down ticks
process garbage rows that never reach an output slot (the standard
GPipe bubble: (S-1)/(M+S-1) of the schedule).

Differentiability is the point of doing this with JAX primitives: the
transpose of ``ppermute`` is the reverse ``ppermute`` and the transpose
of ``scan`` is the reverse-order scan, so ``jax.grad`` through the
pipelined forward IS pipelined backpropagation — the full WGAN-GP
alternating step (train/step.py, injected via its ``gen_apply`` hook)
trains with a pipelined generator and an unchanged critic path. The
critic (and its grad-of-grad GP) is data-parallel over the mesh; only
the generator's block stack is staged.

Param layout: the per-block trees ``block_0..block_{L-1}`` are
homogeneous, so ``pp_stack_params`` stacks them into one ``blocks``
subtree with a leading [L] dim that shards ``P("stage")``;
``pp_unstack_params`` is the exact inverse (round-trip tested), so
standard checkpoints convert in and trained pipelines convert back out
for serving/eval. ``pp_import_state`` maps a whole TrainState across —
including the Adam moments inside opt_g, which are params-shaped
subtrees.

Equivalence: the pipelined step equals the single-device step to f32
reduction order — the schedule moves WHERE each block runs, never what
it computes (tests/test_pp.py on the virtual mesh). Multi-chip perf is
unmeasurable in this one-chip container, the same caveat as tp/sp/ep.

MoE generators pipeline too: each staged block runs with
``mutable=["losses"]`` so the Switch load-balancing auxiliary is
collected per (block, microbatch), masked to the ticks that carry real
microbatches (ramp-up/ramp-down ticks process garbage rows whose
router statistics must not count), summed over stages with ``psum``,
averaged over the data axis, and handed back to the train step via the
``gen_apply_aux`` contract (train/step.py). Semantics note: the Switch
aux is a product of token-means, so the per-microbatch aux averaged
over microbatches is NOT bitwise the whole-batch aux — it is the
standard microbatched-MoE semantics (each group of ``mb`` examples
balances independently); the poses themselves are bit-identical to the
dense forward because MoE routing is per-example (capacity slots are
allocated per batch row). tests/test_pp.py pins both statements.

Loud gates: attention-family generator only (a recurrent G has one
scan, not a block stack), ``tr_blocks % n_stage == 0``, and microbatch
divisibility.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import GANConfig
from ..models.configs import GeneratorConfig
from ..train.config import TrainConfig
from .mesh import DATA_AXIS

STAGE_AXIS = "stage"

__all__ = [
    "STAGE_AXIS",
    "make_mesh_pp",
    "check_pp_family",
    "pp_stack_params",
    "pp_unstack_params",
    "pp_import_state",
    "pp_export_params",
    "make_pp_generator_apply",
    "pp_train_step",
]


def make_mesh_pp(n_data: int, n_stage: int, devices=None) -> Mesh:
    """(data x stage) mesh over the first n_data*n_stage devices. The
    stage axis is fastest (adjacent devices) so the per-microbatch
    activation hops ride nearest-neighbor ICI links."""
    import numpy as np

    devs = list(devices if devices is not None else jax.devices())
    need = n_data * n_stage
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    grid = np.asarray(devs[:need]).reshape(n_data, n_stage)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def check_pp_family(gan: GANConfig, n_stage: int) -> None:
    """Pipeline parallelism stages a homogeneous block stack; everything
    else is an upfront error with the alternative named."""
    g = gan.generator
    if g.arch != "transformer":
        raise ValueError(
            f"pipeline parallelism stages the attention generator's "
            f"block stack; generator.arch={g.arch!r} has a single "
            "recurrent scan, not stages — use parallel.dp / train.tbptt "
            "for the recurrent family"
        )
    if n_stage < 1 or g.tr_blocks % n_stage:
        raise ValueError(
            f"stage axis of {n_stage} does not divide generator."
            f"tr_blocks={g.tr_blocks} — pick a block count that is a "
            "multiple of the stage axis"
        )


def _split_blocks(params: dict) -> tuple[dict, list]:
    inner = params["params"]
    n = sum(1 for k in inner if k.startswith("block_"))
    blocks = [inner[f"block_{i}"] for i in range(n)]
    rest = {k: v for k, v in inner.items() if not k.startswith("block_")}
    return rest, blocks


def pp_stack_params(params: dict) -> dict:
    """{"params": {block_0..block_{L-1}, ...}} -> {"params": {"blocks":
    stacked [L, ...], ...}}. Works on any params-shaped tree (raw
    weights, EMA, Adam mu/nu), which is what makes pp_import_state a
    pure tree operation."""
    rest, blocks = _split_blocks(params)
    if not blocks:
        raise ValueError("no block_i subtrees to stack — not an "
                         "attention-family params tree")
    rest["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {"params": rest}


def pp_unstack_params(params: dict) -> dict:
    """Exact inverse of pp_stack_params (for checkpoints/serving)."""
    inner = dict(params["params"])
    stacked = inner.pop("blocks")
    n = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(n):
        inner[f"block_{i}"] = jax.tree.map(lambda x: x[i], stacked)
    return {"params": inner}


def _is_params_shaped(node) -> bool:
    return (
        isinstance(node, dict)
        and set(node.keys()) == {"params"}
        and isinstance(node["params"], dict)
        and any(k.startswith("block_") for k in node["params"])
    )


def pp_import_state(state):
    """TrainState with standard g-params -> the stacked PP layout.

    g_params, ema_g_params, and the params-shaped subtrees inside opt_g
    (Adam's mu/nu) all convert; d_params/opt_d are untouched (the
    critic is not pipelined)."""
    opt_g = jax.tree.map(
        lambda n: pp_stack_params(n) if _is_params_shaped(n) else n,
        state.opt_g,
        is_leaf=_is_params_shaped,
    )
    ema = state.ema_g_params
    if ema is not None:
        ema = pp_stack_params(ema)
    return state.replace(
        g_params=pp_stack_params(state.g_params), opt_g=opt_g,
        ema_g_params=ema,
    )


def pp_export_params(g_params: dict) -> dict:
    """Stacked PP g-params -> the standard layout every other surface
    (checkpoints, eval, serving, decode) consumes."""
    return pp_unstack_params(g_params)


def _pre(cfg: GeneratorConfig, params: dict, feats, z):
    """Everything before the block stack — mirrors models/transformer.py
    TransformerGenerator.__call__ exactly (encoder -> in_proj -> +posenc);
    pinned bit-for-bit by tests/test_pp.py::test_pp_forward_matches."""
    import flax.linen as nn

    from ..models.generator import AudioEncoder
    from ..models.transformer import sinusoidal_positions

    b, t, _ = feats.shape
    enc = AudioEncoder(cfg).apply({"params": params["encoder"]}, feats)
    z_seq = jnp.broadcast_to(z[:, None, :], (b, t, cfg.noise_dim))
    x = nn.Dense(cfg.hidden_dim, dtype=cfg.dtype).apply(
        {"params": params["in_proj"]}, jnp.concatenate([enc, z_seq], axis=-1)
    )
    return x + sinusoidal_positions(t, cfg.hidden_dim, x.dtype)[None]


def _post(cfg: GeneratorConfig, params: dict, x):
    """Everything after the block stack — ln_f -> head -> delta cumsum,
    mirroring TransformerGenerator.__call__."""
    import flax.linen as nn

    x = nn.LayerNorm().apply({"params": params["ln_f"]}, x)
    y = nn.relu(
        nn.Dense(cfg.head_hidden, dtype=cfg.dtype).apply(
            {"params": params["head_fc"]}, x
        )
    )
    out = nn.Dense(cfg.pose_dim, dtype="float32").apply(
        {"params": params["head_out"]}, y.astype(jnp.float32)
    )
    if cfg.residual_pose:
        out = jnp.cumsum(out, axis=1)
    return out


def make_pp_generator_apply(
    cfg: GeneratorConfig,
    mesh: Mesh,
    n_micro: int,
):
    """(stacked_g_params, feats, z) -> poses with the block stack
    GPipe-scheduled over the mesh's stage axis. Call it under jit (the
    pipeline region is an inner shard_map); it is differentiable, so
    it plugs straight into train/step.py's ``gen_apply`` hook.

    MoE generators (``cfg.moe_experts > 1``) return ``(poses, moe_aux)``
    — the Switch auxiliary collected per (block, microbatch) on the
    real-microbatch ticks only, block-and-microbatch averaged, data-axis
    averaged (the ``gen_apply_aux`` contract)."""
    from ..models.transformer import TransformerBlock

    if cfg.film_cond:
        raise ValueError(
            "film_cond is not supported under pipeline parallelism: the "
            "stage schedule threads only the hidden activation between "
            "stages, not the per-block FiLM conditioning tensor — train "
            "FiLM models without --pp_stages"
        )
    n_stage = mesh.shape[STAGE_AXIS]
    moe = cfg.moe_experts > 1
    block = TransformerBlock(
        cfg.hidden_dim, cfg.tr_heads, cfg.tr_mlp_ratio, cfg.dtype,
        causal=True, attn_impl=cfg.attn_impl,
        moe_experts=cfg.moe_experts, moe_topk=cfg.moe_topk,
        moe_capacity=cfg.moe_capacity,
    )

    def run_local_blocks(blocks_local, x):
        # [L/S, ...]-stacked params -> sequential per-stage block chain;
        # returns (h, summed Switch aux of this stage's blocks)
        def one(h, bp):
            if moe:
                h2, sown = block.apply({"params": bp}, h,
                                       mutable=["losses"])
                return h2, sum(jax.tree.leaves(sown))
            return block.apply({"params": bp}, h), jnp.float32(0.0)

        h, auxes = jax.lax.scan(one, x, blocks_local)
        return h, jnp.sum(auxes)

    def pipeline_body(blocks_local, x):
        # x: [b_local, T, H] (this data shard, replicated over stage)
        b_local, t, hdim = x.shape
        if b_local % n_micro:
            raise ValueError(
                f"n_micro={n_micro} does not divide the per-data-shard "
                f"batch {b_local} — pick a microbatch count that divides "
                "batch_size / n_data"
            )
        mb = b_local // n_micro
        micro = x.reshape(n_micro, mb, t, hdim)
        stage = jax.lax.axis_index(STAGE_AXIS)
        n_ticks = n_micro + n_stage - 1

        def tick(carry, i):
            buf, outs, aux_acc = carry
            src = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(i, 0, n_micro - 1), 0, keepdims=False
            )
            x_in = jnp.where(stage == 0, src, buf)
            y, aux_t = run_local_blocks(blocks_local, x_in)
            # stage s holds microbatch m at tick i = m + s; every other
            # tick this stage chews ramp garbage whose router statistics
            # must not enter the load-balancing aux
            real = ((i >= stage) & (i < stage + n_micro))
            aux_acc = aux_acc + jnp.where(real, aux_t, 0.0)
            nbuf = jax.lax.ppermute(
                y, STAGE_AXIS, [(s, s + 1) for s in range(n_stage - 1)]
            )
            j = i - (n_stage - 1)
            slot = jnp.clip(j, 0, n_micro - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, slot, 0, keepdims=False)
            new = jnp.where((stage == n_stage - 1) & (j >= 0), y, cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, new, slot, 0)
            return (nbuf, outs, aux_acc), None

        buf0 = jnp.zeros((mb, t, hdim), x.dtype)
        outs0 = jnp.zeros((n_micro, mb, t, hdim), x.dtype)
        (_, outs, aux_acc), _ = jax.lax.scan(
            tick, (buf0, outs0, jnp.float32(0.0)), jnp.arange(n_ticks)
        )
        # only the last stage holds real outputs; masked psum broadcasts
        # them so every stage runs the identical (replicated) head/loss
        outs = jax.lax.psum(
            jnp.where(stage == n_stage - 1, outs, jnp.zeros_like(outs)),
            STAGE_AXIS,
        )
        # stages hold different blocks' aux for the same microbatches:
        # psum -> sum over all (block, microbatch) pairs; normalize to
        # the block-and-microbatch mean; average over data shards
        aux = jax.lax.psum(aux_acc, STAGE_AXIS) / (cfg.tr_blocks * n_micro)
        aux = jax.lax.pmean(aux, DATA_AXIS)
        return outs.reshape(b_local, t, hdim), aux

    pipelined = jax.shard_map(
        pipeline_body,
        mesh=mesh,
        in_specs=(P(STAGE_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P()),
        check_vma=False,
    )

    def apply(g_params, feats, z):
        inner = g_params["params"]
        x = _pre(cfg, inner, feats, z)
        x, aux = pipelined(inner["blocks"], x)
        poses = _post(cfg, inner, x)
        return (poses, aux) if moe else poses

    return apply


def _pp_leaf_spec(path, leaf) -> P:
    names = [k.key for k in path if isinstance(k, jax.tree_util.DictKey)]
    if "blocks" in names:
        ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
        return P(STAGE_AXIS, *([None] * (ndim - 1)))
    return P()


def pp_shardings(tree, mesh: Mesh) -> Any:
    """Stacked block leaves shard their leading [L] dim on "stage";
    everything else (pre/post G weights, the whole critic, both
    optimizers' scalars) replicates."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: NamedSharding(mesh, _pp_leaf_spec(p, x)), tree
    )


def pp_train_step(
    gan: GANConfig,
    tc: TrainConfig,
    mesh: Mesh,
    state,
    n_micro: int = 2,
    donate: bool = True,
    place: bool = True,
):
    """Jitted DP+PP train step over a (data, stage) mesh.

    Returns ``(step_fn, pp_state)``: ``state`` is converted to the
    stacked layout (pp_import_state) and placed with block weights
    sharded on "stage"; the batch shards its leading dim on "data".
    The generator forward/backward is GPipe-scheduled; the critic and
    its WGAN-GP second-order path are data-parallel and replicated over
    the stage axis (GSPMD replays them per stage device — the step is
    generator-dominated at depth, which is when you reach for PP)."""
    from ..train.step import make_train_step

    check_pp_family(gan, mesh.shape[STAGE_AXIS])
    if tc.batch_size % (mesh.shape[DATA_AXIS] * n_micro):
        raise ValueError(
            f"batch_size={tc.batch_size} must divide over "
            f"data axis {mesh.shape[DATA_AXIS]} x n_micro {n_micro}"
        )
    gen_apply = make_pp_generator_apply(gan.generator, mesh, n_micro)
    step = make_train_step(gan, tc, axis_name=None, fused=False,
                           gen_apply=gen_apply,
                           gen_apply_aux=gan.generator.moe_experts > 1)
    pp_state = pp_import_state(state)
    state_sh = pp_shardings(pp_state, mesh)
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    fn = jax.jit(
        step,
        in_shardings=(state_sh, batch_sh),
        out_shardings=(state_sh, NamedSharding(mesh, P())),
        donate_argnums=(0,) if donate else (),
    )
    if place:
        pp_state = jax.device_put(pp_state, state_sh)
    return fn, pp_state
