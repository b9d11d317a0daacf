"""Fused Pallas kernels for the critic's recurrent core (first order).

Round-2 phase profiling (benchmarks/run_phases.py) put the critic update
at 11.1 ms of the ~14 ms full-preset train step — ~4 sequential XLA scan
passes (forward, GP pullback, and the backward of both), each
latency-bound at ~8-15 us/timestep of loop machinery. This module fuses
the critic scan the same way ops/fused_generator.py fuses the generator:

- K1 ``critic_scan_forward``: the whole multilayer GRU time scan as one
  Pallas grid, weights VMEM-resident, emitting the per-step top hidden
  state (the score head stays in XLA — one [T*B, H] @ [H, 1] matmul).
- K2 ``critic_cotangent_chain``: the reverse cotangent scan. It carries
  only the truly sequential dh chains and emits the per-(step, layer)
  *incoming* hidden cotangents ``a_in``; every other backward quantity is
  local to its timestep and is recomputed in batched XLA over [T*B]
  panels (``critic_panel_grads``) — the same two-phase split as
  ops/fused_generator_vjp.py.

``make_fused_critic_scan`` wraps K1+K2 in a first-order ``custom_vjp``
(htop, h_fin as outputs; cotangents on both supported, so TBPTT carries
work). ``fused_critic_apply`` is the drop-in for ``Discriminator.apply``
(recurrent configs): XLA hoisted conv stack + ih0, fused scan, XLA score
head. The second-order path needed by WGAN-GP lives in ops/fused_gp.py
on top of the kernels here.

bfloat16 configs follow the fused-generator mixed-precision contract:
bf16 MXU operands, f32 accumulators/chains (see fused_generator.compute_dtype).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.configs import DiscriminatorConfig
from .fused_generator_vjp import _gate_cotangents


def why_not_fused_critic(cfg: DiscriminatorConfig, interpret: bool) -> str | None:
    """None when the fused critic kernels apply; else a human-readable
    reason (surfaced as a one-time warning by train/step.py so an XLA
    fallback is never silent)."""
    if cfg.arch != "rnn":
        return (
            f"critic arch={cfg.arch!r} (the attention family has no "
            "sequential scan to fuse)"
        )
    if cfg.cell not in ("gru", "lstm"):
        return f"critic cell={cfg.cell!r} (kernels implement GRU and LSTM)"
    if cfg.rnn_layers < 1:
        return "critic rnn_layers < 1 (TCN critics have no scan to fuse)"
    if cfg.dtype not in ("float32", "bfloat16"):
        return f"critic dtype={cfg.dtype!r} (kernels support float32/bfloat16)"
    if not interpret and (cfg.hidden_dim % 128 != 0):
        return (
            f"critic hidden_dim={cfg.hidden_dim} not a multiple of 128 "
            "(gate splits are lane-dimension slices on TPU)"
        )
    if not interpret:
        from .cell_math import rnn_weights_vmem_bytes, width_fits_vmem

        cdt_bytes = 2 if cfg.dtype == "bfloat16" else 4
        wb = rnn_weights_vmem_bytes(cfg.rnn_layers, cfg.hidden_dim,
                                    cfg.cell, cdt_bytes)
        if not width_fits_vmem(wb):
            return (
                f"critic too wide for VMEM-resident kernel weights "
                f"({wb / 2**20:.0f} MB at hidden_dim={cfg.hidden_dim}; the "
                "scoped budget is 64 MB) — wide models ride the XLA path"
            )
    return None


def supports_fused_critic(cfg: DiscriminatorConfig, interpret: bool) -> bool:
    return why_not_fused_critic(cfg, interpret) is None


def critic_compute_dtype(cfg: DiscriminatorConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


# ---------------------------------------------------------------------------
# Weight plumbing: the scan core's weights in a fixed flat order
# ---------------------------------------------------------------------------

def critic_weight_names(cfg: DiscriminatorConfig) -> list[str]:
    names = []
    for l in range(cfg.rnn_layers):
        names += [f"cell_l{l}.hh.kernel", f"cell_l{l}.hh.bias"]
        if l > 0:
            names += [f"ih_l{l}.kernel", f"ih_l{l}.bias"]
    return names


def extract_critic_weights(core_params: Any, cfg: DiscriminatorConfig) -> tuple:
    """params['step']['core'] subtree -> flat tuple (critic_weight_names order)."""

    def get(path: str):
        node = core_params
        for part in path.split("."):
            node = node[part]
        return node

    return tuple(get(n) for n in critic_weight_names(cfg))


def cast_critic_weights(weights: tuple, cfg: DiscriminatorConfig) -> tuple:
    """Kernel-ready: matmul kernels in compute dtype, biases f32, biases
    as [1, D] rows (TPU wants >= 2D)."""
    cdt = critic_compute_dtype(cfg)
    names = critic_weight_names(cfg)
    out = []
    for n, w in zip(names, weights):
        w2 = w if w.ndim > 1 else w[None, :]
        out.append(w2.astype(cdt) if n.endswith(".kernel") else w2.astype(jnp.float32))
    return tuple(out)


# ---------------------------------------------------------------------------
# Shared recompute: forward gates of one step (kernel and XLA phase-2)
# ---------------------------------------------------------------------------

from .cell_math import cell_step as _cell_step  # noqa: E402
from .cell_math import gate_cotangents as _cell_cots  # noqa: E402
from .cell_math import fit_tb, gate_factor, state_slots  # noqa: E402
from .gru_math import gru_gates as _gru_gates  # noqa: E402  (shared algebra)
from .gru_math import pack_gates as _pack_gates  # noqa: E402


def _recompute_core(gi0, hprev_layers, weights, cfg, dot, cprev_layers=None):
    """Forward recompute for one step (panel shapes [..., H] work too).

    Returns per-layer act dicts (the fields gate_cotangents expects) plus
    ``x``; cell-generic via cell_math (``cprev_layers`` required for
    LSTM). Used by the XLA reference scans in the test suites."""
    from .cell_math import acts_from_saved as _afs

    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    acts = []
    x = gi0
    for l in range(layers):
        h = hprev_layers[l]
        c = cprev_layers[l] if cprev_layers is not None else None
        gh = dot(h, weights[f"cell_l{l}.hh.kernel"]) + weights[f"cell_l{l}.hh.bias"]
        h_new, _c_new, stream = _cell_step(cfg.cell, x, gh, h, c, hidden)
        act = _afs(cfg.cell, [stream], [h], [c], hidden)[0]
        act["x"] = x
        acts.append(act)
        if l + 1 < layers:
            x = dot(h_new, weights[f"ih_l{l + 1}.kernel"]) + weights[f"ih_l{l + 1}.bias"]
    return acts


def acts_from_saved(gates, hprev_layers, cfg, cprev_layers=None):
    """Per-layer act dicts from K1's saved gate streams (cell_math helper
    bound to this config's cell and hidden size). ``cprev_layers`` is
    required for LSTM (the c state rows entering each step)."""
    from .cell_math import acts_from_saved as _afs

    if cprev_layers is None:
        cprev_layers = [None] * len(gates)
    return _afs(cfg.cell, gates, hprev_layers, cprev_layers, cfg.hidden_dim)


# ---------------------------------------------------------------------------
# K1: forward scan kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(*refs, cfg: DiscriminatorConfig, tb: int, t_total: int, n_weights: int):
    (gi_ref, h0_ref), w_refs = refs[:2], refs[2 : 2 + n_weights]
    htop_ref, hprev_ref, gates_ref, hfin_ref = refs[2 + n_weights : 6 + n_weights]
    (h_scr,) = refs[6 + n_weights :]

    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    lstm = cfg.cell == "lstm"  # static: branches fold at trace time
    cdt = critic_compute_dtype(cfg)
    i = pl.program_id(0)
    weights = {n: r for n, r in zip(critic_weight_names(cfg), w_refs)}

    @pl.when(i == 0)
    def _():
        h_scr[...] = h0_ref[...]

    def step(t, _):
        @pl.when(i * tb + t < t_total)
        def _():
            x = gi_ref[t].astype(jnp.float32)
            hprev_ref[t] = h_scr[...]  # all S*L entering state rows
            h_new = None
            for l in range(layers):
                h = h_scr[l]
                c = h_scr[layers + l] if lstm else None
                gh = jnp.dot(
                    h.astype(cdt), weights[f"cell_l{l}.hh.kernel"][...],
                    preferred_element_type=jnp.float32,
                ) + weights[f"cell_l{l}.hh.bias"][...]
                h_new, c_new, stream = _cell_step(cfg.cell, x, gh, h, c, hidden)
                gates_ref[t, l] = stream.astype(cdt)
                h_scr[l] = h_new
                if lstm:
                    h_scr[layers + l] = c_new
                if l + 1 < layers:
                    x = jnp.dot(
                        h_new.astype(cdt), weights[f"ih_l{l + 1}.kernel"][...],
                        preferred_element_type=jnp.float32,
                    ) + weights[f"ih_l{l + 1}.bias"][...]
            htop_ref[t] = h_new

        return 0

    jax.lax.fori_loop(0, tb, step, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hfin_ref[...] = h_scr[...]


def critic_scan_forward(
    gi_tm: jax.Array,   # [T, B, G*H] time-major hoisted input projection
    h0: jax.Array,      # [S*L, B, H] stacked state (h rows, then c rows)
    weights: tuple,     # extract_critic_weights order (uncast)
    cfg: DiscriminatorConfig,
    tb: int | None = None,   # None: fit to batch (cell_math.fit_tb)
    interpret: bool | None = None,
):
    """Returns (htop [T,B,H], hprev [T,S*L,B,H], gates [T,L,B,4H],
    h_fin [S*L,B,H]), all f32. ``gates`` packs [r|z|n|hn] (GRU) /
    [i|f|g|o] (LSTM) per (step, layer) so every downstream kernel/panel
    skips the forward recompute; state rows follow the cell_math stacking
    convention (S=1 GRU, S=2 LSTM)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, b, ghg = gi_tm.shape
    if tb is None:
        tb = fit_tb(8, b, cfg.hidden_dim)
    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    g = gate_factor(cfg.cell)
    sl = state_slots(cfg.cell) * layers
    assert ghg == g * hidden
    assert h0.shape[0] == sl

    # uneven trailing block: grids are ceil(t / tb) with in-kernel masking
    # — NO host-side jnp.pad / [:t] slicing. A profiler trace showed those
    # pads and slices copying tens of MB of streams per train step (the
    # kernels were ~1.9 ms of a 5.3 ms step; glue was the rest).
    gi_p = gi_tm.astype(critic_compute_dtype(cfg))
    n_blocks = pl.cdiv(t, tb)
    w = cast_critic_weights(weights, cfg)

    kern = functools.partial(
        _fwd_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=len(w)
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    htop, hprev, gates, hfin = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, b, g * hidden), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((sl, b, hidden)),
        ] + [const(x.shape) for x in w],
        out_specs=[
            pl.BlockSpec((tb, b, hidden), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, sl, b, hidden), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, b, 4 * hidden), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const((sl, b, hidden)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, sl, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, layers, b, 4 * hidden),
                                 critic_compute_dtype(cfg)),
            jax.ShapeDtypeStruct((sl, b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((sl, b, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(gi_p, h0, *w)
    return htop, hprev, gates, hfin


# ---------------------------------------------------------------------------
# K2: reverse cotangent-chain kernel
# ---------------------------------------------------------------------------

def _cot_kernel(*refs, cfg: DiscriminatorConfig, tb: int, t_total: int, n_weights: int):
    (gcot_ref, hprev_ref, gates_ref, ghfin_ref) = refs[:4]
    w_refs = refs[4 : 4 + n_weights]
    ain_ref, dh0_ref = refs[4 + n_weights : 6 + n_weights]
    (dh_scr,) = refs[6 + n_weights :]

    layers = cfg.rnn_layers
    lstm = cfg.cell == "lstm"  # static
    weights_map = {n: r for n, r in zip(critic_weight_names(cfg), w_refs)}

    class _Lazy:  # load at use site; materializing all weights spills VMEM
        def __getitem__(self, name):
            return weights_map[name][...]

    weights = _Lazy()
    dot_t = lambda a, b: jax.lax.dot_general(
        a.astype(b.dtype), b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        dh_scr[...] = ghfin_ref[...]

    def step(tt, _):
        t = tb - 1 - tt

        @pl.when((n_blocks - 1 - i) * tb + t < t_total)
        def _():
            # gates were saved by K1: the only matmul left per step is the
            # chain transpose dgh @ Whh^T
            acts = acts_from_saved(
                [gates_ref[t, l] for l in range(layers)],
                [hprev_ref[t, l] for l in range(layers)], cfg,
                [hprev_ref[t, layers + l] for l in range(layers)] if lstm
                else None,
            )

            dabove = gcot_ref[t]
            for l in range(layers - 1, -1, -1):
                a = dh_scr[l] + dabove
                ac = dh_scr[layers + l] if lstm else None
                ain_ref[t, l] = a
                if lstm:
                    ain_ref[t, layers + l] = ac
                dgi, dgh, h_part, c_part = _cell_cots(cfg.cell, a, ac, acts[l])
                dh_scr[l] = h_part + dot_t(dgh, weights[f"cell_l{l}.hh.kernel"])
                if lstm:
                    dh_scr[layers + l] = c_part
                if l > 0:
                    dabove = dot_t(dgi, weights[f"ih_l{l}.kernel"])

        return 0

    jax.lax.fori_loop(0, tb, step, 0)

    @pl.when(i == n_blocks - 1)
    def _():
        dh0_ref[...] = dh_scr[...]


def critic_cotangent_chain(
    gcot_tm: jax.Array,  # [T, B, H] cotangent on htop (f32)
    g_hfin: jax.Array,   # [S*L, B, H] cotangent on the final stacked carry
    hprev: jax.Array,    # [T, S*L, B, H] saved pre-step state rows
    gates: jax.Array,    # [T, L, B, 4H] saved gate streams (K1)
    weights: tuple,      # uncast
    cfg: DiscriminatorConfig,
    tb: int | None = None,   # None: fit to batch (cell_math.fit_tb)
    interpret: bool | None = None,
):
    """Returns (a_in [T,S*L,B,H], dh0 [S*L,B,H]): incoming state cotangents
    per (step, layer row) and the h0 cotangent — h-cotangent rows first,
    then (LSTM) the incoming cell cotangents."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = gcot_tm.shape[0]
    b = gcot_tm.shape[1]
    if tb is None:
        tb = fit_tb(8, b, cfg.hidden_dim)
    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    sl = state_slots(cfg.cell) * layers
    n_blocks = pl.cdiv(t, tb)  # uneven trailing block; masking in-kernel
    w = cast_critic_weights(weights, cfg)

    kern = functools.partial(
        _cot_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=len(w)
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    rev = lambda tail: (lambda i: (n_blocks - 1 - i,) + tail)
    a_in, dh0 = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, b, hidden), rev((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, sl, b, hidden), rev((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, b, 4 * hidden), rev((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            const((sl, b, hidden)),
        ] + [const(x.shape) for x in w],
        out_specs=[
            pl.BlockSpec((tb, sl, b, hidden), rev((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            const((sl, b, hidden)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, sl, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((sl, b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((sl, b, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(gcot_tm, hprev, gates, g_hfin, *w)
    return a_in, dh0


# ---------------------------------------------------------------------------
# Phase 2 (XLA): batched weight gradients + input cotangents from a_in
# ---------------------------------------------------------------------------

def _wdict(weights: tuple, cfg: DiscriminatorConfig) -> dict:
    """Name -> dtype-cast weight (matmul dtype carried by the value)."""
    cdt = critic_compute_dtype(cfg)
    return {
        n: (w.astype(cdt) if n.endswith(".kernel") else w.astype(jnp.float32))
        for n, w in zip(critic_weight_names(cfg), weights)
    }


def _dot_cast(a, c):
    return jnp.dot(a.astype(c.dtype), c, preferred_element_type=jnp.float32)


def col_sum(x2d, like):
    """Bias gradient: column sum of a [T*B, D] cotangent panel as an MXU
    ones-matmul in the weight dtype (f32 accumulate). For bf16 configs
    this reads the SAME bf16 panel the weight-grad matmul consumes, so
    XLA never materializes a second f32 copy of the stream — the panels
    are HBM-bound (trace: ~90 MB of mixed bf16+f32 stream outputs per
    step). Precision-consistent with the mixed-precision contract: the
    weight grads already ride bf16 operands; f32 configs are unchanged
    (the cast is a no-op and the dot is an exact f32 sum)."""
    ones = jnp.ones((1, x2d.shape[0]), like.dtype)
    return jax.lax.dot_general(
        ones, x2d.astype(like.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[0]


def critic_panel_grads(a_in, gates, hprev, weights, cfg):
    """All weight grads + the gi cotangent as [T*B]-panel matmuls.

    a_in [T,S*L,B,H], gates [T,L,B,4H], hprev [T,S*L,B,H]; weights uncast.
    Returns (grads dict keyed by critic_weight_names, dgi [T,B,G*H] in
    critic_compute_dtype(cfg) — bf16 for bfloat16 configs: the layer-0
    cotangent is pre-cast so its f32 stream copy dies, see below).
    """
    layers = cfg.rnn_layers
    lstm = cfg.cell == "lstm"
    wd = _wdict(weights, cfg)
    acts = acts_from_saved(
        [gates[:, l] for l in range(layers)],
        [hprev[:, l] for l in range(layers)], cfg,
        [hprev[:, layers + l] for l in range(layers)] if lstm else None,
    )

    def panel(x):
        return x.reshape(-1, x.shape[-1])

    def grad_mm(a, b, like):
        return jax.lax.dot_general(
            panel(a).astype(like.dtype), panel(b).astype(like.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    grads = {}
    dgi0 = None
    for l in range(layers - 1, -1, -1):
        a = a_in[:, l]
        ac = a_in[:, layers + l] if lstm else None
        dgi, dgh, _, _ = _cell_cots(cfg.cell, a, ac, acts[l])
        grads[f"cell_l{l}.hh.kernel"] = grad_mm(
            acts[l]["h"], dgh, wd[f"cell_l{l}.hh.kernel"]
        )
        grads[f"cell_l{l}.hh.bias"] = col_sum(panel(dgh), wd[f"cell_l{l}.hh.kernel"])
        if l > 0:
            grads[f"ih_l{l}.kernel"] = grad_mm(
                acts[l - 1]["h_new"], dgi, wd[f"ih_l{l}.kernel"]
            )
            grads[f"ih_l{l}.bias"] = col_sum(panel(dgi), wd[f"ih_l{l}.kernel"])
        else:
            # pre-cast to the compute dtype: every caller feeds dgi into a
            # cdt-typed cotangent anyway, and emitting cdt here lets the
            # f32 copy of the layer-0 gate-cotangent stream die
            dgi0 = dgi.astype(critic_compute_dtype(cfg))
    return grads, dgi0


def input_grad_from_chain(a_in, gates, hprev, cfg):
    """Just the gi cotangent: layer-0 dgi, locally recomputed from a_in
    (a_in already contains the cross-layer and cross-step chaining)."""
    layers = cfg.rnn_layers
    lstm = cfg.cell == "lstm"
    acts = acts_from_saved([gates[:, 0]], [hprev[:, 0]], cfg,
                           [hprev[:, layers]] if lstm else None)
    ac = a_in[:, layers] if lstm else None
    dgi0, _dgh, _, _ = _cell_cots(cfg.cell, a_in[:, 0], ac, acts[0])
    return dgi0


# ---------------------------------------------------------------------------
# First-order custom-VJP scan op + drop-in critic apply
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def make_fused_critic_scan(cfg: DiscriminatorConfig, tb: int = 8,
                           interpret: bool | None = None):
    """Differentiable fused critic scan:
    (gi_tm [T,B,3H], h0, weights) -> (htop [T,B,H], h_fin [L,B,H])."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports_fused_critic(cfg, interpret):
        raise ValueError("config not supported by the fused critic kernel")

    @jax.custom_vjp
    def scan_fn(gi_tm, h0, weights):
        htop, _hprev, _gates, hfin = critic_scan_forward(
            gi_tm, h0, weights, cfg, tb=tb, interpret=interpret
        )
        return htop, hfin

    def fwd(gi_tm, h0, weights):
        htop, hprev, gates, hfin = critic_scan_forward(
            gi_tm, h0, weights, cfg, tb=tb, interpret=interpret
        )
        return (htop, hfin), (hprev, gates, weights)

    def bwd(res, cots):
        hprev, gates, weights = res
        gi_dtype = critic_compute_dtype(cfg)
        g_htop, g_hfin = cots
        a_in, dh0 = critic_cotangent_chain(
            g_htop, g_hfin, hprev, gates, weights, cfg, tb=tb, interpret=interpret
        )
        grads, dgi = critic_panel_grads(a_in, gates, hprev, weights, cfg)
        names = critic_weight_names(cfg)
        dweights = tuple(
            grads[n].reshape(w.shape).astype(w.dtype)
            for n, w in zip(names, weights)
        )
        return dgi.astype(gi_dtype), dh0, dweights

    scan_fn.defvjp(fwd, bwd)
    return scan_fn


def compute_critic_gi(params: Any, cfg: DiscriminatorConfig, poses, feats):
    """XLA hoisted path: conv stack + ih0 projection (mirrors
    models/discriminator.py flax semantics, incl. compute dtype)."""
    cdt = critic_compute_dtype(cfg)
    x = poses
    if cfg.conditional:
        if feats is None:
            raise ValueError("conditional critic requires audio features")
        x = jnp.concatenate([poses, feats], axis=-1)
    x = x.astype(cdt)
    for l in range(cfg.conv_layers):
        leaf = params[f"conv_{l}"]
        x = jax.lax.conv_general_dilated(
            x, leaf["kernel"].astype(cdt), (1,), "SAME",
            rhs_dilation=(cfg.conv_dilation ** l,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + leaf["bias"].astype(cdt)
        x = jax.nn.leaky_relu(x, negative_slope=0.2)
    leaf = params["ih0"]
    return jnp.matmul(x, leaf["kernel"].astype(cdt)) + leaf["bias"].astype(cdt)


def fused_critic_apply(
    variables: Any,
    cfg: DiscriminatorConfig,
    poses: jax.Array,
    feats: jax.Array | None,
    carry=None,
    return_carry: bool = False,
    tb: int | None = None,   # None: fit to batch (cell_math.fit_tb)
    interpret: bool | None = None,
):
    """Drop-in for Discriminator.apply (recurrent critics): score [B]."""
    from .cell_math import fit_tb, stack_rnn_carry, unstack_rnn_carry

    params = variables.get("params", variables)
    b, t = poses.shape[:2]
    if tb is None:
        tb = fit_tb(8, b, cfg.hidden_dim)  # scan closes over tb
    gi = compute_critic_gi(params, cfg, poses, feats)       # [B, T, G*H]
    gi_tm = jnp.swapaxes(gi, 0, 1)
    sl = state_slots(cfg.cell) * cfg.rnn_layers
    if carry is None:
        h0 = jnp.zeros((sl, b, cfg.hidden_dim), jnp.float32)
    else:
        h0 = stack_rnn_carry(cfg.cell, carry)
    weights = extract_critic_weights(params["step"]["core"], cfg)
    scan_fn = make_fused_critic_scan(cfg, tb=tb, interpret=interpret)
    htop_tm, hfin = scan_fn(gi_tm, h0, weights)
    hfin = unstack_rnn_carry(cfg.cell, hfin, cfg.rnn_layers)
    leaf = params["step"]["score"]
    scores = jnp.matmul(htop_tm, leaf["kernel"].astype(jnp.float32)) + leaf[
        "bias"
    ].astype(jnp.float32)                                    # [T, B, 1] f32
    score = jnp.mean(scores, axis=(0, 2))                    # [B]
    if return_carry:
        return score, hfin
    return score
