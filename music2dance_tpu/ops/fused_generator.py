"""Fused Pallas kernel for the generator's autoregressive time scan.

Why: the XLA `lax.scan` pays ~8-10 us of loop machinery per timestep
(buffer rotation, while-loop bookkeeping) — at T=181 and several scan
passes per train step that overhead IS the train-step cost (profiled in
round 1; neither `_split_transpose` nor `unroll` moved it). This kernel
runs the ENTIRE sequential part of the generator — pose-feedback
projection, L GRU layers, pose head, residual integration — as one Pallas
grid with all weights VMEM-resident, reducing per-step cost to the raw
MXU/VPU work.

Scope (guarded in `fused_generator_forward`):
- cell "gru", autoregressive mode (the training/inference default);
  teacher forcing falls back to the XLA scan.
- hidden_dim % 128 == 0 for the compiled TPU path (gate splits are
  lane-dimension slices); any size works in interpret mode (CPU tests).

Time-major layout [T, B, ...] inside the op: the per-step slice is then an
index on an untiled leading axis (free), never a lane/sublane slice.

The backward pass is two-phase (ops/fused_generator_vjp.py): a sequential
Pallas kernel for the cotangent chain, then batched XLA matmuls for all
weight gradients — the weight-gradient accumulators never fight the
recurrence for VMEM.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.configs import GeneratorConfig


def why_not_fused(cfg: GeneratorConfig, interpret: bool) -> str | None:
    """None when the fused generator kernels apply; else a human-readable
    reason (surfaced as a one-time warning by train/step.py so an XLA
    fallback is never silent — a fallback costs ~3.4x in steps/s)."""
    if cfg.arch != "rnn":
        return (
            f"generator arch={cfg.arch!r} (the attention family is "
            "parallel over time — XLA batches its matmuls onto the MXU "
            "directly; there is no sequential scan to fuse)"
        )
    if cfg.cell not in ("gru", "lstm"):
        return f"generator cell={cfg.cell!r} (kernels implement GRU and LSTM)"
    if not cfg.autoregressive:
        return "generator autoregressive=False (teacher-forcing scan is XLA-only)"
    if cfg.dtype not in ("float32", "bfloat16"):
        return f"generator dtype={cfg.dtype!r} (kernels support float32/bfloat16)"
    if not interpret and (cfg.hidden_dim % 128 != 0):
        return (
            f"generator hidden_dim={cfg.hidden_dim} not a multiple of 128 "
            "(gate splits are lane-dimension slices on TPU)"
        )
    if not interpret:
        from .cell_math import (gate_factor, rnn_weights_vmem_bytes,
                                width_fits_vmem)

        cdt_bytes = 2 if cfg.dtype == "bfloat16" else 4
        g = gate_factor(cfg.cell)
        wb = rnn_weights_vmem_bytes(cfg.rnn_layers, cfg.hidden_dim,
                                    cfg.cell, cdt_bytes)
        wb += cfg.pose_dim * g * cfg.hidden_dim * cdt_bytes   # ih0_pose
        wb += cfg.hidden_dim * cfg.head_hidden * cdt_bytes    # head_fc
        wb += cfg.head_hidden * cfg.pose_dim * 4              # head_out (f32)
        if not width_fits_vmem(wb):
            return (
                f"generator too wide for VMEM-resident kernel weights "
                f"({wb / 2**20:.0f} MB at hidden_dim={cfg.hidden_dim}; the "
                "scoped budget is 64 MB) — wide models ride the XLA path, "
                "whose large matmuls fill the MXU anyway "
                "(benchmarks/run_width_scaling.py)"
            )
    return None


def supports_fused(cfg: GeneratorConfig, interpret: bool) -> bool:
    return why_not_fused(cfg, interpret) is None


def compute_dtype(cfg: GeneratorConfig):
    """Matmul operand dtype. bfloat16 configs run mixed precision inside
    the kernels: bf16 MXU operands (one systolic pass instead of three,
    half the VMEM/DMA traffic for weights and gi_static), float32
    accumulators, gates, carries and poses. The pose head output matmul
    stays float32 end-to-end (it feeds losses and the AR integration —
    mirrors models/generator.py head_out dtype="float32")."""
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


# weights whose matmul operands stay f32 even in bf16 configs
_F32_WEIGHTS = ("head_out.kernel",)


def cast_weights(weights: tuple, cfg: GeneratorConfig) -> tuple:
    """Kernel-ready weights: matmul kernels in compute dtype, biases (and
    head_out) in f32. Identity for float32 configs."""
    cdt = compute_dtype(cfg)
    names = weight_names(cfg)
    return tuple(
        w.astype(cdt)
        if (w.ndim > 1 and n.endswith(".kernel") and n not in _F32_WEIGHTS)
        else w.astype(jnp.float32)
        for n, w in zip(names, weights)
    )


# ---------------------------------------------------------------------------
# Weight plumbing: flax param tree -> flat tuple in a fixed order
# ---------------------------------------------------------------------------

def weight_names(cfg: GeneratorConfig) -> list[str]:
    names = ["ih0_pose.kernel"]
    for l in range(cfg.rnn_layers):
        names += [f"core.cell_l{l}.hh.kernel", f"core.cell_l{l}.hh.bias"]
        if l > 0:
            names += [f"core.ih_l{l}.kernel", f"core.ih_l{l}.bias"]
    names += ["head_fc.kernel", "head_fc.bias", "head_out.kernel", "head_out.bias"]
    return names


def extract_step_weights(step_params: Any, cfg: GeneratorConfig) -> tuple:
    """params['step'] subtree -> flat weight tuple (order = weight_names)."""

    def get(path: str):
        node = step_params
        for part in path.split("."):
            node = node[part]
        return node

    return tuple(get(n) for n in weight_names(cfg))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

from .cell_math import cell_step as _cell_step
from .cell_math import gate_factor, state_slots


def _fwd_kernel(*refs, cfg: GeneratorConfig, tb: int, t_total: int,
                n_weights: int, save_acts: bool):
    (gi_ref, h0_ref, prev0_ref), w_refs = refs[:3], refs[3 : 3 + n_weights]
    k = 3 + n_weights
    poses_ref, hprev_ref, pprev_ref, hfin_ref, pfin_ref = refs[k : k + 5]
    k += 5
    if save_acts:
        gates_ref, ypre_ref = refs[k : k + 2]
        k += 2
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
            gi_s = gi_ref[t]          # [B, G*H] compute dtype
            prev = prev_scr[...]      # [B, P] f32 carry
            pprev_ref[t] = prev
            # all S*L state rows entering this step (h rows, then c rows)
            hprev_ref[t] = h_scr[...]

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
                    gates_ref[t, l] = stream.astype(cdt)
                h_scr[l] = h_new
                if lstm:
                    h_scr[layers + l] = c_new
                if l + 1 < layers:
                    x = jnp.dot(
                        h_new.astype(cdt), weights[f"core.ih_l{l + 1}.kernel"][...],
                        preferred_element_type=jnp.float32,
                    ) + weights[f"core.ih_l{l + 1}.bias"][...]

            y_pre = jnp.dot(
                h_new.astype(cdt), weights["head_fc.kernel"][...],
                preferred_element_type=jnp.float32,
            ) + weights["head_fc.bias"][...]
            if save_acts:
                ypre_ref[t] = y_pre
            y = jax.nn.relu(y_pre)
            out = jnp.dot(
                y, weights["head_out.kernel"][...],
                preferred_element_type=jnp.float32,
            ) + weights["head_out.bias"][...]
            pose = prev + out if cfg.residual_pose else out
            poses_ref[t] = pose
            prev_scr[...] = pose

        return 0

    jax.lax.fori_loop(0, tb, step, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hfin_ref[...] = h_scr[...]
        pfin_ref[...] = prev_scr[...]


def fused_generator_forward(
    gi_static: jax.Array,   # [B, T, G*H] hoisted input projection (batch-major)
    h0: jax.Array,          # [S*L, B, H] stacked state (h rows, then c rows)
    prev0: jax.Array,       # [B, P]
    weights: tuple,         # extract_step_weights order
    cfg: GeneratorConfig,
    tb: int | None = None,  # None: fit to batch (cell_math.fit_tb)
    interpret: bool | None = None,
    save_acts: bool = False,
):
    """Returns (poses [B,T,P], hprev [T,S*L,B,H], pprev [T,B,P],
    h_final [S*L,B,H], prev_final [B,P]) — plus, with ``save_acts``,
    (gates [T,L,B,4H], ypre [T,B,head_hidden]) appended: the saved
    forward streams that let the backward kernel and the weight-grad
    panels skip every forward-recompute matmul. State arrays follow the
    cell_math stacking convention (S=1 for GRU — identical to the
    original GRU-only shapes; S=2 for LSTM: h layers then c layers)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports_fused(cfg, interpret):
        raise ValueError("config not supported by the fused generator kernel")

    b, t, ghg = gi_static.shape
    if tb is None:
        from .cell_math import fit_tb

        tb = fit_tb(4, b, cfg.hidden_dim)
    hidden, layers, p_dim = cfg.hidden_dim, cfg.rnn_layers, cfg.pose_dim
    g = gate_factor(cfg.cell)
    sl = state_slots(cfg.cell) * layers
    assert ghg == g * hidden
    assert h0.shape[0] == sl

    gi_tm = jnp.swapaxes(gi_static, 0, 1).astype(compute_dtype(cfg))  # [T, B, G*H]
    n_blocks = pl.cdiv(t, tb)  # uneven trailing block; masking in-kernel

    # biases as [1, D] rows (TPU wants >= 2D); kernels in compute dtype
    weights = cast_weights(
        tuple(w if w.ndim > 1 else w[None, :] for w in weights), cfg
    )
    names = weight_names(cfg)
    n_weights = len(names)

    kern = functools.partial(
        _fwd_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=n_weights,
        save_acts=save_acts,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)

    out_specs = [
        pl.BlockSpec((tb, b, p_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, sl, b, hidden), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tb, b, p_dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        const((sl, b, hidden)),
        const((b, p_dim)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((t, b, p_dim), jnp.float32),
        jax.ShapeDtypeStruct((t, sl, b, hidden), jnp.float32),
        jax.ShapeDtypeStruct((t, b, p_dim), jnp.float32),
        jax.ShapeDtypeStruct((sl, b, hidden), jnp.float32),
        jax.ShapeDtypeStruct((b, p_dim), jnp.float32),
    ]
    if save_acts:
        out_specs += [
            pl.BlockSpec((tb, layers, b, 4 * hidden), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, cfg.head_hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((t, layers, b, 4 * hidden), compute_dtype(cfg)),
            jax.ShapeDtypeStruct((t, b, cfg.head_hidden), jnp.float32),
        ]

    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, b, g * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((sl, b, hidden)),
            const((b, p_dim)),
        ] + [const(w.shape) for w in weights],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((sl, b, hidden), jnp.float32),
            pltpu.VMEM((b, p_dim), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(gi_tm, h0, prev0, *weights)

    poses_tm, hprev, pprev, h_fin, p_fin = outs[:5]
    poses = jnp.swapaxes(poses_tm, 0, 1)  # [B, T, P]
    base = (poses, hprev, pprev, h_fin, p_fin)
    if save_acts:
        gates, ypre = outs[5], outs[6]
        return base + (gates, ypre)
    return base


# ---------------------------------------------------------------------------
# Drop-in apply: flax param tree -> fused forward
# ---------------------------------------------------------------------------

def compute_gi_static(params: Any, cfg: GeneratorConfig, feats: jax.Array, z: jax.Array):
    """Replicates Generator's hoisted path (encoder + ih0_static) from the
    param tree with raw lax ops — the fused kernel consumes its output.
    Mirrors flax module dtype semantics: inputs and kernels cast to the
    compute dtype (bf16 for bfloat16 configs), so the hoisted matmuls ride
    single-pass MXU and gi_static DMAs at half width."""
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
    z_seq = jnp.broadcast_to(z[:, None, :], (b, t, cfg.noise_dim)).astype(cdt)
    static_in = jnp.concatenate([x, z_seq], axis=-1)
    leaf = params["ih0_static"]
    return jnp.matmul(static_in, leaf["kernel"].astype(cdt)) + leaf["bias"].astype(cdt)


def fused_apply(
    variables: Any,
    cfg: GeneratorConfig,
    feats: jax.Array,
    z: jax.Array,
    carry=None,
    return_carry: bool = False,
    tb: int | None = None,   # None: fit to batch (cell_math.fit_tb)
    interpret: bool | None = None,
):
    """Fused-kernel equivalent of Generator.apply (forward).

    Same contract: poses [B, T, P] (+ final carry), same parameters, same
    numerics up to matmul rounding (tests/test_fused_generator.py).
    """
    from .cell_math import stack_rnn_carry, unstack_rnn_carry

    params = variables.get("params", variables)
    b = feats.shape[0]
    gi = compute_gi_static(params, cfg, feats, z)
    if carry is None:
        sl = state_slots(cfg.cell) * cfg.rnn_layers
        h0 = jnp.zeros((sl, b, cfg.hidden_dim), jnp.float32)
        prev0 = jnp.zeros((b, cfg.pose_dim), jnp.float32)
    else:
        rnn_carry, prev0 = carry
        h0 = stack_rnn_carry(cfg.cell, rnn_carry)
    w = extract_step_weights(params["step"], cfg)
    poses, _hprev, _pprev, h_fin, p_fin = fused_generator_forward(
        gi, h0, prev0, w, cfg, tb=tb, interpret=interpret
    )
    if return_carry:
        return poses, (unstack_rnn_carry(cfg.cell, h_fin, cfg.rnn_layers), p_fin)
    return poses
