"""Custom VJP for the fused generator scan (ops/fused_generator.py).

Backward is two-phase (the VMEM budget forces it — see docs/DESIGN.md §3):

Phase 1 — sequential Pallas kernel, reverse over time. Carries the only
truly sequential quantities: the per-layer hidden cotangent chain dh and
the pose-feedback cotangent chain dprev. The forward saved its gate
streams [r|z|n|hn] and head pre-activations (save-don't-recompute,
round 2), so per step the ONLY matmuls left are the unavoidable chain
transposes (dgh @ Whhᵀ, dgi @ Wihᵀ, the head transposes, dgi₀ @ Wposeᵀ) —
the forward-recompute matmuls are gone. The kernel emits the per-step
*incoming* hidden cotangents ``dh_in[t, l]`` and total pose cotangents
``dpose[t]``.

Phase 2 — batched XLA. Given dh_in/dpose and the saved streams, every
remaining quantity is local to its timestep and ALL weight gradients
become single large MXU matmuls (e.g. dWhh = hprevᵀ @ dgh over T*B rows).
No weight-gradient accumulator ever rides the sequential loop — the
classic scan-transpose bottleneck.

Gradient coverage: gi_static, h0, prev0, and every step weight. The
critic phase has its own kernel bank (ops/fused_critic.py, ops/fused_gp.py
for the WGAN-GP second order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.configs import GeneratorConfig
from .cell_math import acts_from_saved as _cell_acts
from .cell_math import gate_cotangents as _cell_cots
from .cell_math import state_slots
from .gru_math import gate_cotangents as _gate_cotangents  # GRU fast path (fused_gp)
from .fused_generator import (
    cast_weights,
    compute_dtype,
    fused_generator_forward,
    supports_fused,
    weight_names,
)


# ---------------------------------------------------------------------------
# Phase 1: sequential cotangent-chain kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, cfg: GeneratorConfig, tb: int, t_total: int, n_weights: int):
    (gp_ref, hprev_ref, gates_ref, ypre_ref, ghfin_ref, gpfin_ref) = refs[:6]
    w_refs = refs[6 : 6 + n_weights]
    dhin_ref, dpose_ref, dh0_ref, dprev0_ref = refs[6 + n_weights : 10 + n_weights]
    dh_scr, dprev_scr = refs[10 + n_weights :]

    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    lstm = cfg.cell == "lstm"  # static
    names = weight_names(cfg)
    w_ref_map = {n: r for n, r in zip(names, w_refs)}

    class _LazyWeights:
        """Load each weight from VMEM at its use site — materializing all
        of them up front spills ~10 MB of vregs to stack and OOMs VMEM."""

        def __getitem__(self, name):
            return w_ref_map[name][...]

    weights = _LazyWeights()
    dot_t = lambda a, b: jax.lax.dot_general(  # a @ b.T
        a.astype(b.dtype), b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        # final-carry cotangents seed the chains (TBPTT uses them)
        dh_scr[...] = ghfin_ref[...]
        dprev_scr[...] = gpfin_ref[...]

    def step(tt, _):
        t = tb - 1 - tt  # reverse within the block; grid is reverse-indexed

        @pl.when((n_blocks - 1 - i) * tb + t < t_total)
        def _():
            acts = _cell_acts(
                cfg.cell,
                [gates_ref[t, l] for l in range(layers)],
                [hprev_ref[t, l] for l in range(layers)],
                [hprev_ref[t, layers + l] for l in range(layers)] if lstm
                else [None] * layers,
                hidden,
            )

            dpose_total = gp_ref[t] + dprev_scr[...]
            dpose_ref[t] = dpose_total

            y_pre = ypre_ref[t]
            dy = dot_t(dpose_total, weights["head_out.kernel"]) * (
                y_pre > 0.0
            ).astype(jnp.float32)
            dh_top_extra = dot_t(dy, weights["head_fc.kernel"])

            dfrom_above = dh_top_extra
            dgi0 = None
            for l in range(layers - 1, -1, -1):
                a = dh_scr[l] + dfrom_above
                ac = dh_scr[layers + l] if lstm else None
                dhin_ref[t, l] = a
                if lstm:
                    dhin_ref[t, layers + l] = ac
                dgi, dgh, h_part, c_part = _cell_cots(cfg.cell, a, ac, acts[l])
                dh_scr[l] = h_part + dot_t(dgh, weights[f"core.cell_l{l}.hh.kernel"])
                if lstm:
                    dh_scr[layers + l] = c_part
                if l > 0:
                    dfrom_above = dot_t(dgi, weights[f"core.ih_l{l}.kernel"])
                else:
                    dgi0 = dgi

            dprev = dot_t(dgi0, weights["ih0_pose.kernel"])
            if cfg.residual_pose:
                dprev = dprev + dpose_total
            dprev_scr[...] = dprev

        return 0

    jax.lax.fori_loop(0, tb, step, 0)

    @pl.when(i == n_blocks - 1)
    def _():
        dh0_ref[...] = dh_scr[...]
        dprev0_ref[...] = dprev_scr[...]


def _chain_backward(
    g_poses_tm, g_hfin, g_pfin, hprev, gates, ypre, weights, cfg, tb, t, interpret
):
    """Run phase 1. All sequence args time-major, natural length t
    (uneven trailing grid block; the kernel masks)."""
    b = hprev.shape[2]
    hidden, layers, p_dim = cfg.hidden_dim, cfg.rnn_layers, cfg.pose_dim
    sl = state_slots(cfg.cell) * layers
    n_blocks = pl.cdiv(t, tb)
    names = weight_names(cfg)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    rev = lambda *tail: (lambda i: (n_blocks - 1 - i,) + tail[0])

    kern = functools.partial(
        _bwd_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=len(names)
    )
    dh_in, dpose, dh0, dprev0 = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, b, p_dim), rev((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, sl, b, hidden), rev((0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, b, 4 * hidden), rev((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, cfg.head_hidden), rev((0, 0)),
                         memory_space=pltpu.VMEM),
            const((sl, b, hidden)),
            const((b, p_dim)),
        ] + [const(w.shape) for w in weights],
        out_specs=[
            pl.BlockSpec((tb, sl, b, hidden), rev((0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, p_dim), rev((0, 0)), memory_space=pltpu.VMEM),
            const((sl, b, hidden)),
            const((b, p_dim)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, sl, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, b, p_dim), jnp.float32),
            jax.ShapeDtypeStruct((sl, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, p_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((sl, b, hidden), jnp.float32),
            pltpu.VMEM((b, p_dim), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(g_poses_tm, hprev, gates, ypre, g_hfin, g_pfin, *weights)
    return dh_in, dpose, dh0, dprev0


# ---------------------------------------------------------------------------
# Phase 2: batched weight gradients + dgi_static (pure XLA)
# ---------------------------------------------------------------------------

def _weight_grads(dh_in, dpose, pprev, hprev, gates, ypre, weights_dict, cfg):
    """All remaining gradients as [T*B]-panel matmuls from saved streams.

    ``weights_dict`` values carry their matmul dtype (bf16 kernels for
    bfloat16 configs — fused_generator.cast_weights); every panel matmul
    casts its operands to that dtype and accumulates in f32."""
    layers = cfg.rnn_layers
    lstm = cfg.cell == "lstm"
    acts = _cell_acts(
        cfg.cell,
        [gates[:, l] for l in range(layers)],
        [hprev[:, l] for l in range(layers)],
        [hprev[:, layers + l] for l in range(layers)] if lstm
        else [None] * layers,
        cfg.hidden_dim,
    )
    y = jax.nn.relu(ypre)
    h_top = acts[-1]["h_new"]

    def panel(x):  # [T, B, D] -> [T*B, D]
        return x.reshape(-1, x.shape[-1])

    def grad_mm(a, b, like):  # a^T @ b in the dtype of weight ``like``
        return jax.lax.dot_general(
            panel(a).astype(like.dtype), panel(b).astype(like.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    from .fused_critic import col_sum

    wd = weights_dict
    grads = {}
    dout = dpose
    grads["head_out.kernel"] = grad_mm(y, dout, wd["head_out.kernel"])
    grads["head_out.bias"] = col_sum(panel(dout), wd["head_out.kernel"])
    dy = (dout @ wd["head_out.kernel"].astype(jnp.float32).T) * (ypre > 0.0)
    grads["head_fc.kernel"] = grad_mm(h_top, dy, wd["head_fc.kernel"])
    grads["head_fc.bias"] = col_sum(panel(dy), wd["head_fc.kernel"])

    dgi0 = None
    for l in range(layers - 1, -1, -1):
        a = dh_in[:, l]
        ac = dh_in[:, layers + l] if lstm else None
        dgi, dgh, _, _ = _cell_cots(cfg.cell, a, ac, acts[l])
        grads[f"core.cell_l{l}.hh.kernel"] = grad_mm(
            acts[l]["h"], dgh, wd[f"core.cell_l{l}.hh.kernel"]
        )
        grads[f"core.cell_l{l}.hh.bias"] = col_sum(
            panel(dgh), wd[f"core.cell_l{l}.hh.kernel"]
        )
        if l > 0:
            grads[f"core.ih_l{l}.kernel"] = grad_mm(
                acts[l - 1]["h_new"], dgi, wd[f"core.ih_l{l}.kernel"]
            )
            grads[f"core.ih_l{l}.bias"] = col_sum(
                panel(dgi), wd[f"core.ih_l{l}.kernel"]
            )
        else:
            dgi0 = dgi
    grads["ih0_pose.kernel"] = grad_mm(pprev, dgi0, wd["ih0_pose.kernel"])
    dgi_static = dgi0  # gi0 = gi_static + proj -> same cotangent
    return grads, dgi_static


# ---------------------------------------------------------------------------
# custom_vjp assembly
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def make_fused_scan(cfg: GeneratorConfig, tb: int = 4, interpret: bool | None = None):
    """Differentiable fused scan: (gi_static, h0, prev0, weights) ->
    (poses, h_final, prev_final), with the two-phase custom backward."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports_fused(cfg, interpret):
        raise ValueError("config not supported by the fused generator kernel")

    @jax.custom_vjp
    def scan_fn(gi_static, h0, prev0, weights):
        poses, _hp, _pp, h_fin, p_fin = fused_generator_forward(
            gi_static, h0, prev0, weights, cfg, tb=tb, interpret=interpret
        )
        return poses, h_fin, p_fin

    def fwd(gi_static, h0, prev0, weights):
        poses, hprev, pprev, h_fin, p_fin, gates, ypre = fused_generator_forward(
            gi_static, h0, prev0, weights, cfg, tb=tb, interpret=interpret,
            save_acts=True,
        )
        return (poses, h_fin, p_fin), (hprev, pprev, gates, ypre, weights)

    def bwd(res, cots):
        hprev, pprev, gates, ypre, weights = res
        g_poses, g_hfin, g_pfin = cots
        t = hprev.shape[0]

        weights2d = cast_weights(
            tuple(w if w.ndim > 1 else w[None, :] for w in weights), cfg
        )
        names = weight_names(cfg)
        wd = dict(zip(names, cast_weights(weights, cfg)))

        gp_tm = jnp.swapaxes(g_poses, 0, 1)

        dh_in, dpose, dh0, dprev0 = _chain_backward(
            gp_tm, g_hfin, g_pfin, hprev, gates, ypre,
            weights2d, cfg, tb, t, interpret,
        )
        grads, dgi_static_tm = _weight_grads(
            dh_in, dpose, pprev, hprev, gates, ypre, wd, cfg
        )
        dweights = tuple(
            grads[n].reshape(w.shape).astype(w.dtype) for n, w in zip(names, weights)
        )
        # cotangent dtype must match the primal (bf16 gi_static in bf16 configs)
        dgi_static = jnp.swapaxes(dgi_static_tm, 0, 1).astype(compute_dtype(cfg))
        return dgi_static, dh0, dprev0, dweights

    scan_fn.defvjp(fwd, bwd)
    return scan_fn


def fused_apply_diff(
    variables,
    cfg: GeneratorConfig,
    feats: jax.Array,
    z: jax.Array,
    carry=None,
    return_carry: bool = False,
    tb: int | None = None,   # None: fit to batch (cell_math.fit_tb)
    interpret: bool | None = None,
):
    """Differentiable fused forward: gradients flow to params, feats, z.

    The hoisted encoder/ih0_static run as ordinary (differentiable) XLA;
    the sequential scan uses the custom-VJP fused kernel. Drop-in for
    Generator.apply in the generator phase of training.
    """
    from .cell_math import stack_rnn_carry, unstack_rnn_carry
    from .fused_generator import compute_gi_static, extract_step_weights

    params = variables.get("params", variables)
    b = feats.shape[0]
    if tb is None:
        from .cell_math import fit_tb

        tb = fit_tb(4, b, cfg.hidden_dim)  # make_fused_scan closes over tb
    gi = compute_gi_static(params, cfg, feats, z)
    if carry is None:
        sl = state_slots(cfg.cell) * cfg.rnn_layers
        h0 = jnp.zeros((sl, b, cfg.hidden_dim), jnp.float32)
        prev0 = jnp.zeros((b, cfg.pose_dim), jnp.float32)
    else:
        rnn_carry, prev0 = carry
        h0 = stack_rnn_carry(cfg.cell, rnn_carry)
    weights = extract_step_weights(params["step"], cfg)
    scan_fn = make_fused_scan(cfg, tb=tb, interpret=interpret)
    poses, h_fin, p_fin = scan_fn(gi, h0, prev0, weights)
    if return_carry:
        return poses, (unstack_rnn_carry(cfg.cell, h_fin, cfg.rnn_layers), p_fin)
    return poses
