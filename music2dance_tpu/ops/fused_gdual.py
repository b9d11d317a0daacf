"""Dual generator forward: every fake batch of one train step in ONE pass.

One alternating train step runs the generator forward ``n_critic + 1``
times: once per critic iteration (forward-only — the fake is
``stop_gradient``-ed for the D loss) and once differentiably for the
generator phase. All of them share the generator parameters (the D
updates in between don't touch them) and differ only in the noise draw,
so they are row-independent replicas of the same scan — a single fused
kernel at ``(n_critic + 1) * B`` rows replaces n_critic + 1 sequential
passes (measured 0.82 ms each at B=32, config #3, while extra rows cost
~0.15 ms per 32 — benchmarks/run_dcore_bench.py methodology).

The glue-free lesson of ops/fused_dcore.py applies: the kernel takes
separate refs for the forward-only rows and the differentiable rows,
saves the backward streams (gates, head pre-activations, hprev, pprev)
ONLY for the differentiable rows, and emits per-branch pose outputs — so
the two-phase VJP (ops/fused_generator_vjp.py, reused verbatim) runs at
B rows and nothing downstream concatenates or slices in HBM.

Contract: the forward-only branch is NON-differentiable. The wrapper
``fused_dual_apply`` returns its poses (and its slice of the final
carries) under ``jax.lax.stop_gradient``, which guarantees the custom
VJP only ever sees zero cotangents there; the backward ignores them and
returns zeros for ``gi_fwd``. This matches the train step exactly: the
critic-phase fakes are stop_gradient-ed by WGAN semantics anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.configs import GeneratorConfig
from .cell_math import cell_step as _cell_step
from .cell_math import gate_factor, state_slots
from .fused_generator import (
    cast_weights,
    compute_dtype,
    supports_fused,
    weight_names,
)
from .fused_generator_vjp import _chain_backward, _weight_grads


def supports_dual(cfg: GeneratorConfig, b_fwd: int, interpret: bool) -> bool:
    """The compiled kernel slices rows at the fwd/diff boundary, which
    must be sublane-aligned; interpret mode (CPU tests) takes any size."""
    if not supports_fused(cfg, interpret):
        return False
    if not interpret and b_fwd % 8 != 0:
        return False
    return True


# ---------------------------------------------------------------------------
# Forward kernel: [fwd | diff] rows in one scan, streams saved for diff only
# ---------------------------------------------------------------------------

def _dual_fwd_kernel(*refs, cfg: GeneratorConfig, tb: int, t_total: int,
                     n_weights: int, bf: int, save_acts: bool):
    (gi_f_ref, gi_d_ref, h0_ref, prev0_ref) = refs[:4]
    w_refs = refs[4 : 4 + n_weights]
    k = 4 + n_weights
    (poses_f_ref, poses_d_ref, hfin_ref, pfin_ref) = refs[k : k + 4]
    k += 4
    if save_acts:
        hprev_ref, pprev_ref, gates_ref, ypre_ref = refs[k : k + 4]
        k += 4
    h_scr, prev_scr = refs[k:]

    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    lstm = cfg.cell == "lstm"  # static: branches fold at trace time
    cdt = compute_dtype(cfg)
    i = pl.program_id(0)
    weights = {n: r for n, r in zip(weight_names(cfg), w_refs)}

    @pl.when(i == 0)
    def _():
        h_scr[...] = h0_ref[...]
        prev_scr[...] = prev0_ref[...]

    def step(t, _):
        @pl.when(i * tb + t < t_total)
        def _():
            gi_s = jnp.concatenate([gi_f_ref[t], gi_d_ref[t]], axis=0)
            prev = prev_scr[...]
            if save_acts:
                pprev_ref[t] = prev[bf:]
                hprev_ref[t] = h_scr[:, bf:]  # diff slice of all S*L rows

            x = gi_s.astype(jnp.float32) + jnp.dot(
                prev.astype(cdt), weights["ih0_pose.kernel"][...],
                preferred_element_type=jnp.float32,
            )
            h_new = None
            for l in range(layers):
                h = h_scr[l]
                c = h_scr[layers + l] if lstm else None
                gh = jnp.dot(
                    h.astype(cdt), weights[f"core.cell_l{l}.hh.kernel"][...],
                    preferred_element_type=jnp.float32,
                ) + weights[f"core.cell_l{l}.hh.bias"][...]
                h_new, c_new, stream = _cell_step(cfg.cell, x, gh, h, c, hidden)
                if save_acts:
                    gates_ref[t, l] = stream.astype(cdt)[bf:]
                h_scr[l] = h_new
                if lstm:
                    h_scr[layers + l] = c_new
                if l + 1 < layers:
                    x = jnp.dot(
                        h_new.astype(cdt),
                        weights[f"core.ih_l{l + 1}.kernel"][...],
                        preferred_element_type=jnp.float32,
                    ) + weights[f"core.ih_l{l + 1}.bias"][...]

            y_pre = jnp.dot(
                h_new.astype(cdt), weights["head_fc.kernel"][...],
                preferred_element_type=jnp.float32,
            ) + weights["head_fc.bias"][...]
            if save_acts:
                ypre_ref[t] = y_pre[bf:]
            y = jax.nn.relu(y_pre)
            out = jnp.dot(
                y, weights["head_out.kernel"][...],
                preferred_element_type=jnp.float32,
            ) + weights["head_out.bias"][...]
            pose = prev + out if cfg.residual_pose else out
            poses_f_ref[t] = pose[:bf]
            poses_d_ref[t] = pose[bf:]
            prev_scr[...] = pose

        return 0

    jax.lax.fori_loop(0, tb, step, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hfin_ref[...] = h_scr[...]
        pfin_ref[...] = prev_scr[...]


def dual_generator_forward(
    gi_fwd: jax.Array,    # [Bf, T, G*H] hoisted projections, fwd-only rows
    gi_diff: jax.Array,   # [Bd, T, G*H] hoisted projection, diff rows
    h0: jax.Array,        # [S*L, Bf+Bd, H] stacked state rows
    prev0: jax.Array,     # [Bf+Bd, P]
    weights: tuple,
    cfg: GeneratorConfig,
    tb: int | None = None,   # None: fit to total rows (cell_math.fit_tb)
    interpret: bool | None = None,
    save_acts: bool = False,
):
    """Returns (poses_fwd [Bf,T,P], poses_diff [Bd,T,P], h_fin [S*L,Bf+Bd,H],
    p_fin [Bf+Bd,P]) — with ``save_acts``, (hprev, pprev, gates, ypre) of
    the DIFF rows appended (time-major, the fused_generator_vjp layout)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bf, t = gi_fwd.shape[:2]
    bd = gi_diff.shape[0]
    if tb is None:
        from .cell_math import fit_tb

        tb = fit_tb(4, bf + bd, cfg.hidden_dim)
    if not supports_dual(cfg, bf, interpret):
        raise ValueError("config/shape not supported by the dual generator kernel")
    hidden, layers, p_dim = cfg.hidden_dim, cfg.rnn_layers, cfg.pose_dim
    g = gate_factor(cfg.cell)
    sl = state_slots(cfg.cell) * layers

    cdt = compute_dtype(cfg)

    def to_tm(x):  # [B, T, D] -> [T, B, D] in compute dtype
        return jnp.swapaxes(x, 0, 1).astype(cdt)

    n_blocks = pl.cdiv(t, tb)  # uneven trailing block; masking in-kernel
    weights = cast_weights(
        tuple(w if w.ndim > 1 else w[None, :] for w in weights), cfg
    )

    kern = functools.partial(
        _dual_fwd_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=len(weights),
        bf=bf, save_acts=save_acts,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = lambda tail: (lambda i: (i,) + tail)

    out_specs = [
        pl.BlockSpec((tb, bf, p_dim), blk((0, 0)), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, bd, p_dim), blk((0, 0)), memory_space=pltpu.VMEM),
        const((sl, bf + bd, hidden)),
        const((bf + bd, p_dim)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, bf, p_dim), jnp.float32),
        jax.ShapeDtypeStruct((t, bd, p_dim), jnp.float32),
        jax.ShapeDtypeStruct((sl, bf + bd, hidden), jnp.float32),
        jax.ShapeDtypeStruct((bf + bd, p_dim), jnp.float32),
    ]
    if save_acts:
        out_specs += [
            pl.BlockSpec((tb, sl, bd, hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, bd, p_dim), blk((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, bd, 4 * hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, bd, cfg.head_hidden), blk((0, 0)),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((t, sl, bd, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, bd, p_dim), jnp.float32),
            jax.ShapeDtypeStruct((t, layers, bd, 4 * hidden), cdt),
            jax.ShapeDtypeStruct((t, bd, cfg.head_hidden), jnp.float32),
        ]

    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, bf, g * hidden), blk((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, bd, g * hidden), blk((0, 0)), memory_space=pltpu.VMEM),
            const((sl, bf + bd, hidden)),
            const((bf + bd, p_dim)),
        ] + [const(w.shape) for w in weights],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((sl, bf + bd, hidden), jnp.float32),
            pltpu.VMEM((bf + bd, p_dim), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(to_tm(gi_fwd), to_tm(gi_diff), h0, prev0, *weights)

    poses_f, poses_d, h_fin, p_fin = outs[:4]
    base = (
        jnp.swapaxes(poses_f, 0, 1),
        jnp.swapaxes(poses_d, 0, 1),
        h_fin,
        p_fin,
    )
    if save_acts:
        hprev, pprev, gates, ypre = outs[4:]
        return base + (hprev, pprev, gates, ypre)
    return base


# ---------------------------------------------------------------------------
# custom_vjp: differentiable on the diff branch only
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def make_dual_scan(cfg: GeneratorConfig, b_fwd: int, tb: int = 4,
                   interpret: bool | None = None):
    """(gi_fwd, gi_diff, h0, prev0, weights) -> (poses_fwd, poses_diff,
    h_fin, p_fin). Gradients flow through poses_diff and the diff slice
    of the final carries ONLY (the two-phase VJP of
    ops/fused_generator_vjp.py at Bd rows); the fwd branch returns zero
    cotangents — callers must stop_gradient its outputs (the
    ``fused_dual_apply`` wrapper does)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports_dual(cfg, b_fwd, interpret):
        raise ValueError("config not supported by the dual generator kernel")

    @jax.custom_vjp
    def dual_fn(gi_fwd, gi_diff, h0, prev0, weights):
        poses_f, poses_d, h_fin, p_fin = dual_generator_forward(
            gi_fwd, gi_diff, h0, prev0, weights, cfg, tb=tb, interpret=interpret
        )
        return poses_f, poses_d, h_fin, p_fin

    def fwd(gi_fwd, gi_diff, h0, prev0, weights):
        (poses_f, poses_d, h_fin, p_fin, hprev, pprev, gates, ypre) = (
            dual_generator_forward(
                gi_fwd, gi_diff, h0, prev0, weights, cfg, tb=tb,
                interpret=interpret, save_acts=True,
            )
        )
        return (poses_f, poses_d, h_fin, p_fin), (hprev, pprev, gates, ypre, weights)

    def bwd(res, cots):
        hprev, pprev, gates, ypre, weights = res
        _g_poses_f, g_poses_d, g_hfin, g_pfin = cots
        bf = b_fwd
        t = hprev.shape[0]

        weights2d = cast_weights(
            tuple(w if w.ndim > 1 else w[None, :] for w in weights), cfg
        )
        names = weight_names(cfg)
        wd = dict(zip(names, cast_weights(weights, cfg)))

        gp_tm = jnp.swapaxes(g_poses_d, 0, 1)
        dh_in, dpose, dh0_d, dprev0_d = _chain_backward(
            gp_tm, g_hfin[:, bf:], g_pfin[bf:], hprev, gates,
            ypre, weights2d, cfg, tb, t, interpret,
        )
        grads, dgi_static_tm = _weight_grads(
            dh_in, dpose, pprev, hprev, gates, ypre, wd, cfg
        )
        dweights = tuple(
            grads[n].reshape(w.shape).astype(w.dtype)
            for n, w in zip(names, weights)
        )
        cdt = compute_dtype(cfg)
        dgi_diff = jnp.swapaxes(dgi_static_tm, 0, 1).astype(cdt)
        dgi_fwd = jnp.zeros((bf,) + dgi_diff.shape[1:], cdt)
        hidden = cfg.hidden_dim
        sl = state_slots(cfg.cell) * cfg.rnn_layers
        dh0 = jnp.concatenate(
            [jnp.zeros((sl, bf, hidden), jnp.float32), dh0_d], axis=1
        )
        dprev0 = jnp.concatenate(
            [jnp.zeros((bf, cfg.pose_dim), jnp.float32), dprev0_d], axis=0
        )
        return dgi_fwd, dgi_diff, dh0, dprev0, dweights

    dual_fn.defvjp(fwd, bwd)
    return dual_fn


# ---------------------------------------------------------------------------
# Drop-in apply: all of one step's fakes from the flax param tree
# ---------------------------------------------------------------------------

def compute_gi_multi(params, cfg: GeneratorConfig, feats: jax.Array, zs):
    """Hoisted projections for several noise draws with the conv encoder
    run ONCE (it does not depend on z). Returns one [B, T, 3H] array per z,
    each bit-identical to fused_generator.compute_gi_static(params, cfg,
    feats, z) — same op order, same dtypes."""
    cdt = compute_dtype(cfg)
    x = feats.astype(cdt)
    if cfg.onset_channel:
        from ..models.generator import append_onset_channel

        x = append_onset_channel(x)
    for l in range(cfg.enc_layers):
        leaf = params["encoder"][f"conv_{l}"]
        x = jax.lax.conv_general_dilated(
            x, leaf["kernel"].astype(cdt), (1,), "SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + leaf["bias"].astype(cdt)
        x = jax.nn.relu(x)
    b, t = feats.shape[:2]
    leaf = params["ih0_static"]
    kernel, bias = leaf["kernel"].astype(cdt), leaf["bias"].astype(cdt)
    gis = []
    for z in zs:
        z_seq = jnp.broadcast_to(z[:, None, :], (b, t, cfg.noise_dim)).astype(cdt)
        static_in = jnp.concatenate([x, z_seq], axis=-1)
        gis.append(jnp.matmul(static_in, kernel) + bias)
    return gis


def fused_dual_apply(
    variables,
    cfg: GeneratorConfig,
    feats: jax.Array,
    zs_fwd,                 # sequence of [B, noise_dim] noise draws (critic phases)
    z_diff: jax.Array,      # [B, noise_dim] noise draw (generator phase)
    tb: int | None = None,  # None: fit to total rows (cell_math.fit_tb)
    interpret: bool | None = None,
):
    """All of one train step's fake batches in one fused forward.

    Returns ``(fakes_fwd, fake_diff)`` where ``fakes_fwd`` is a list of
    ``len(zs_fwd)`` pose batches [B, T, P], each already
    ``stop_gradient``-ed (critic-phase semantics), and ``fake_diff``
    [B, T, P] is differentiable wrt the generator parameters through the
    two-phase custom VJP. Per-row numerics are identical to separate
    ``fused_apply`` / ``fused_apply_diff`` calls (rows don't interact)."""
    from .fused_generator import extract_step_weights

    params = variables.get("params", variables)
    b = feats.shape[0]
    n_fwd = len(zs_fwd)
    gis = compute_gi_multi(params, cfg, feats, list(zs_fwd) + [z_diff])
    gi_fwd = jax.lax.stop_gradient(jnp.concatenate(gis[:n_fwd], axis=0))
    gi_diff = gis[n_fwd]

    bt = (n_fwd + 1) * b
    if tb is None:
        from .cell_math import fit_tb

        tb = fit_tb(4, bt, cfg.hidden_dim)  # make_dual_scan closes over tb
    sl = state_slots(cfg.cell) * cfg.rnn_layers
    h0 = jnp.zeros((sl, bt, cfg.hidden_dim), jnp.float32)
    prev0 = jnp.zeros((bt, cfg.pose_dim), jnp.float32)
    weights = extract_step_weights(params["step"], cfg)

    dual = make_dual_scan(cfg, n_fwd * b, tb=tb, interpret=interpret)
    poses_f, poses_d, _h_fin, _p_fin = dual(gi_fwd, gi_diff, h0, prev0, weights)
    poses_f = jax.lax.stop_gradient(poses_f)
    fakes_fwd = [poses_f[i * b : (i + 1) * b] for i in range(n_fwd)]
    return fakes_fwd, poses_d
