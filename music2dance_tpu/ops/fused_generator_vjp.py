"""Custom VJP for the fused generator scan (ops/fused_generator.py).

Backward is two-phase (the VMEM budget forces it — see docs/DESIGN.md §3):

Phase 1 — sequential Pallas kernel, reverse over time. Carries the only
truly sequential quantities: the per-layer hidden cotangent chain dh and
the pose-feedback cotangent chain dprev. Per step it recomputes the
forward gates from the saved pre-step states (activation recompute is
cheaper than storing activations) and emits the per-step *incoming* hidden
cotangents ``dh_in[t, l]`` and total pose cotangents ``dpose[t]``.

Phase 2 — batched XLA. Given dh_in/dpose, every remaining quantity is
local to its timestep: gates are recomputed over the whole [T*B] panel at
once and ALL weight gradients become single large MXU matmuls
(e.g. dWhh = hprev^T @ dgh over T*B rows). No weight-gradient accumulator
ever rides the sequential loop — the classic scan-transpose bottleneck.

Gradient coverage: gi_static, h0, prev0, and every step weight. That is
everything the generator phase of training needs (first order only — the
critic keeps pure-XLA autodiff for the WGAN-GP second-order path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.configs import GeneratorConfig
from .fused_generator import (
    _round_up,
    cast_weights,
    compute_dtype,
    fused_generator_forward,
    supports_fused,
    weight_names,
)


# ---------------------------------------------------------------------------
# shared recompute math (used by both phases; phase 1 traces it into the
# kernel, phase 2 traces it into batched XLA)
# ---------------------------------------------------------------------------

def _recompute_step(gi0, hprev_layers, weights, cfg, dot):
    """Forward recompute for one timestep (any batch panel shape [..., H]).

    Returns per-layer (h_prev, x_input_side, gh, r, z, n, h_new) plus the
    head intermediates (y_pre, y, h_top).
    """
    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    acts = []
    x = gi0
    h_new = None
    for l in range(layers):
        h = hprev_layers[l]
        gh = dot(h, weights[f"core.cell_l{l}.hh.kernel"]) + weights[f"core.cell_l{l}.hh.bias"]
        i_r, i_z, i_n = x[..., :hidden], x[..., hidden:2 * hidden], x[..., 2 * hidden:]
        h_r, h_z, h_n = gh[..., :hidden], gh[..., hidden:2 * hidden], gh[..., 2 * hidden:]
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        acts.append({"h": h, "x": x, "hn": h_n, "r": r, "z": z, "n": n, "h_new": h_new})
        if l + 1 < layers:
            x = dot(h_new, weights[f"core.ih_l{l + 1}.kernel"]) + weights[f"core.ih_l{l + 1}.bias"]
    y_pre = dot(h_new, weights["head_fc.kernel"]) + weights["head_fc.bias"]
    y = jax.nn.relu(y_pre)
    return acts, y_pre, y, h_new


def _gate_cotangents(a, act):
    """Incoming hidden cotangent ``a`` -> (dgi, dgh, dh_prev_partial)."""
    r, z, n, h, hn = act["r"], act["z"], act["n"], act["h"], act["hn"]
    dn_pre = a * (1.0 - z) * (1.0 - n * n)
    dz_pre = a * (h - n) * z * (1.0 - z)
    dr_pre = dn_pre * hn * r * (1.0 - r)
    dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
    dh_partial = a * z  # h also feeds gh; that term is added via dgh @ Whh^T
    return dgi, dgh, dh_partial


# ---------------------------------------------------------------------------
# Phase 1: sequential cotangent-chain kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(*refs, cfg: GeneratorConfig, tb: int, t_total: int, n_weights: int):
    (gp_ref, gi_ref, pprev_ref, hprev_ref, ghfin_ref, gpfin_ref) = refs[:6]
    w_refs = refs[6 : 6 + n_weights]
    dhin_ref, dpose_ref, dh0_ref, dprev0_ref = refs[6 + n_weights : 10 + n_weights]
    dh_scr, dprev_scr = refs[10 + n_weights :]

    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    names = weight_names(cfg)
    w_ref_map = {n: r for n, r in zip(names, w_refs)}

    class _LazyWeights:
        """Load each weight from VMEM at its use site — materializing all
        of them up front spills ~10 MB of vregs to stack and OOMs VMEM."""

        def __getitem__(self, name):
            return w_ref_map[name][...]

    weights = _LazyWeights()
    # operands ride the weight's dtype (bf16 kernels in bfloat16 configs —
    # one MXU pass); accumulation is always f32, and the dh/dprev chains
    # live in f32 scratch
    dot = lambda a, b: jnp.dot(a.astype(b.dtype), b, preferred_element_type=jnp.float32)
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
            gi0 = gi_ref[t].astype(jnp.float32) + dot(
                pprev_ref[t], weights["ih0_pose.kernel"]
            )
            hprev_layers = [hprev_ref[t, l] for l in range(layers)]
            acts, y_pre, y, h_top = _recompute_step(gi0, hprev_layers, weights, cfg, dot)

            dpose_total = gp_ref[t] + dprev_scr[...]
            dpose_ref[t] = dpose_total

            dy = dot_t(dpose_total, weights["head_out.kernel"]) * (
                y_pre > 0.0
            ).astype(jnp.float32)
            dh_top_extra = dot_t(dy, weights["head_fc.kernel"])

            dfrom_above = dh_top_extra
            dgi0 = None
            for l in range(layers - 1, -1, -1):
                a = dh_scr[l] + dfrom_above
                dhin_ref[t, l] = a
                dgi, dgh, dh_partial = _gate_cotangents(a, acts[l])
                dh_scr[l] = dh_partial + dot_t(dgh, weights[f"core.cell_l{l}.hh.kernel"])
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
    g_poses_tm, g_hfin, g_pfin, gi_tm, pprev, hprev, weights, cfg, tb, t, interpret
):
    """Run phase 1. All sequence args time-major and padded to t_pad."""
    t_pad = gi_tm.shape[0]
    b = gi_tm.shape[1]
    hidden, layers, p_dim = cfg.hidden_dim, cfg.rnn_layers, cfg.pose_dim
    n_blocks = t_pad // tb
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
            pl.BlockSpec((tb, b, 3 * hidden), rev((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, p_dim), rev((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, b, hidden), rev((0, 0, 0)), memory_space=pltpu.VMEM),
            const((layers, b, hidden)),
            const((b, p_dim)),
        ] + [const(w.shape) for w in weights],
        out_specs=[
            pl.BlockSpec((tb, layers, b, hidden), rev((0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, p_dim), rev((0, 0)), memory_space=pltpu.VMEM),
            const((layers, b, hidden)),
            const((b, p_dim)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, layers, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, b, p_dim), jnp.float32),
            jax.ShapeDtypeStruct((layers, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b, p_dim), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((layers, b, hidden), jnp.float32),
            pltpu.VMEM((b, p_dim), jnp.float32),
        ],
        interpret=interpret,
    )(g_poses_tm, gi_tm, pprev, hprev, g_hfin, g_pfin, *weights)
    return dh_in[:t], dpose[:t], dh0, dprev0


# ---------------------------------------------------------------------------
# Phase 2: batched weight gradients + dgi_static (pure XLA)
# ---------------------------------------------------------------------------

def _weight_grads(dh_in, dpose, gi_tm, pprev, hprev, weights_dict, cfg):
    """All remaining gradients as [T*B]-panel matmuls.

    ``weights_dict`` values carry their matmul dtype (bf16 kernels for
    bfloat16 configs — see fused_generator.cast_weights); every panel
    matmul casts its operands to that dtype and accumulates in f32, the
    same mixed-precision contract as the kernels."""
    t, _, b, hidden = dh_in.shape
    layers = cfg.rnn_layers
    dot = lambda a, c: jnp.dot(a.astype(c.dtype), c, preferred_element_type=jnp.float32)

    gi0 = gi_tm.astype(jnp.float32) + dot(pprev, weights_dict["ih0_pose.kernel"])
    hprev_layers = [hprev[:, l] for l in range(layers)]
    acts, y_pre, y, h_top = _recompute_step(
        gi0, hprev_layers, weights_dict, cfg, dot
    )

    def panel(x):  # [T, B, D] -> [T*B, D]
        return x.reshape(-1, x.shape[-1])

    def grad_mm(a, b, like):  # a^T @ b in the dtype of weight ``like``
        return jax.lax.dot_general(
            panel(a).astype(like.dtype), panel(b).astype(like.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    wd = weights_dict
    grads = {}
    dout = dpose
    grads["head_out.kernel"] = grad_mm(y, dout, wd["head_out.kernel"])
    grads["head_out.bias"] = jnp.sum(panel(dout), axis=0)
    dy = (dout @ wd["head_out.kernel"].astype(jnp.float32).T) * (y_pre > 0.0)
    grads["head_fc.kernel"] = grad_mm(h_top, dy, wd["head_fc.kernel"])
    grads["head_fc.bias"] = jnp.sum(panel(dy), axis=0)

    dgi0 = None
    for l in range(layers - 1, -1, -1):
        a = dh_in[:, l]
        dgi, dgh, _ = _gate_cotangents(a, acts[l])
        grads[f"core.cell_l{l}.hh.kernel"] = grad_mm(
            acts[l]["h"], dgh, wd[f"core.cell_l{l}.hh.kernel"]
        )
        grads[f"core.cell_l{l}.hh.bias"] = jnp.sum(panel(dgh), axis=0)
        if l > 0:
            grads[f"core.ih_l{l}.kernel"] = grad_mm(
                acts[l - 1]["h_new"], dgi, wd[f"core.ih_l{l}.kernel"]
            )
            grads[f"core.ih_l{l}.bias"] = jnp.sum(panel(dgi), axis=0)
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
        poses, hprev, pprev, h_fin, p_fin = fused_generator_forward(
            gi_static, h0, prev0, weights, cfg, tb=tb, interpret=interpret
        )
        return (poses, h_fin, p_fin), (gi_static, hprev, pprev, weights)

    def bwd(res, cots):
        gi_static, hprev, pprev, weights = res
        g_poses, g_hfin, g_pfin = cots
        b, t, _ = gi_static.shape
        t_pad = _round_up(t, tb)

        weights2d = cast_weights(
            tuple(w if w.ndim > 1 else w[None, :] for w in weights), cfg
        )
        names = weight_names(cfg)
        wd = dict(zip(names, cast_weights(weights, cfg)))

        def pad_tm(x):
            return jnp.pad(x, ((0, t_pad - t),) + ((0, 0),) * (x.ndim - 1))

        gi_tm = pad_tm(jnp.swapaxes(gi_static, 0, 1))
        gp_tm = pad_tm(jnp.swapaxes(g_poses, 0, 1))
        hprev_p = pad_tm(hprev)
        pprev_p = pad_tm(pprev)

        dh_in, dpose, dh0, dprev0 = _chain_backward(
            gp_tm, g_hfin, g_pfin, gi_tm, pprev_p, hprev_p,
            weights2d, cfg, tb, t, interpret,
        )
        grads, dgi_static_tm = _weight_grads(
            dh_in, dpose, gi_tm[:t], pprev, hprev, wd, cfg
        )
        dweights = tuple(
            grads[n].reshape(w.shape).astype(w.dtype) for n, w in zip(names, weights)
        )
        # cotangent dtype must match the primal (bf16 gi_static in bf16 configs)
        dgi_static = jnp.swapaxes(dgi_static_tm, 0, 1).astype(gi_static.dtype)
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
    tb: int = 4,
    interpret: bool | None = None,
):
    """Differentiable fused forward: gradients flow to params, feats, z.

    The hoisted encoder/ih0_static run as ordinary (differentiable) XLA;
    the sequential scan uses the custom-VJP fused kernel. Drop-in for
    Generator.apply in the generator phase of training.
    """
    from .fused_generator import compute_gi_static, extract_step_weights

    params = variables.get("params", variables)
    b = feats.shape[0]
    gi = compute_gi_static(params, cfg, feats, z)
    if carry is None:
        h0 = jnp.zeros((cfg.rnn_layers, b, cfg.hidden_dim), jnp.float32)
        prev0 = jnp.zeros((b, cfg.pose_dim), jnp.float32)
    else:
        h0, prev0 = carry
    weights = extract_step_weights(params["step"], cfg)
    scan_fn = make_fused_scan(cfg, tb=tb, interpret=interpret)
    poses, h_fin, p_fin = scan_fn(gi, h0, prev0, weights)
    if return_carry:
        return poses, (h_fin, p_fin)
    return poses
