"""Second-order fused path for the WGAN gradient penalty.

The GP needs ``∇_θ ρ(∇_x D(x̂, θ))`` — gradient-of-gradient through the
critic's recurrent scan. In XLA that costs four sequential scan passes
(forward, input-grad pullback, and the backward of both), each latency-
bound — 11+ ms of the 14 ms full-preset train step (benchmarks/
run_phases.py). This module makes every sequential pass a Pallas kernel.

Exposed op (``make_scan_input_grad``):

    input_grad(gi, gcot, θ_scan) = ∇_gi ⟨gcot, htop(gi, θ_scan)⟩

- forward = K1 (fused_critic.critic_scan_forward) + K2
  (fused_critic.critic_cotangent_chain) + a local XLA recompute — the
  per-step input gradients of the scan.
- its custom VJP is the hand-derived second-order: for a cotangent ``u``
  on the input-grad output, every return term is the directional
  derivative ``∂_ε[·](gi + ε·u)`` of a first-order quantity (standard
  Hessian-vector identity — Φ is scalar so ⟨u, ∇Φ⟩ = ∂_ε Φ(gi+εu)):
    * wrt gi:   ∂_ε ∇_gi Φ — tangent of the cotangent chain,
    * wrt θ:    ∂_ε ∇_θ Φ — tangent weight gradients,
    * wrt gcot: JVP of htop along u (Φ is linear in gcot).
  Two kernels compute the sequential parts: K3 ``_tan_fwd_kernel``
  (forward tangent chain ḣ) and K4 ``_tan_cot_kernel`` (reverse tangent
  cotangent chain ȧ, reading K2's saved a_in instead of re-chaining).
  Everything else — tangent gate algebra over [T*B] panels, weight-grad
  matmuls — is batched XLA (the generator-VJP two-phase pattern).

Save-don't-recompute: K1 saves the gate streams [r|z|n|hn] and K3 saves
the tangent gate streams [ṙ|ż|ṅ|ġh_n], so K2/K4 and every XLA panel run
with NO forward recompute matmul — per step only the unavoidable chain
transposes remain. The streams DMA-pipeline with compute; the removed
matmuls were the cost.

The caller (train/step.py) builds the WGAN-GP as

    gi   = hoisted_convs(θ, x̂)                  # XLA, autodiff handles 2nd order
    gcot = ∂(Σ_b D_b)/∂htop = w_score / T        # explicit head cotangent
    dgi  = input_grad(gi, gcot, θ_scan)          # this op
    ĝ    = vjp(hoisted_convs)(dgi)               # XLA conv transpose
    gp   = mean((‖ĝ‖ - 1)²)

so an outer ``jax.grad`` only ever differentiates XLA ops and THIS op's
custom VJP — never through another custom-VJP's backward (which JAX
forbids). Gradient correctness vs pure-XLA autodiff: tests/test_fused_gp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.configs import DiscriminatorConfig
from .cell_math import gate_cotangents as _cell_cots
from .cell_math import fit_tb, gate_factor, state_slots
from .cell_math import state_tangent_new as _state_tan_new
from .cell_math import tangent_cotangents as _cell_tan_cots
from .cell_math import tangent_gates as _cell_tan_gates
from .cell_math import tans_from_saved as _cell_tans
from .fused_critic import (
    acts_from_saved,
    cast_critic_weights,
    col_sum,
    critic_compute_dtype,
    critic_cotangent_chain,
    critic_scan_forward,
    critic_weight_names,
    input_grad_from_chain,
    supports_fused_critic,
)


# ---------------------------------------------------------------------------
# Tangent-step algebra — cell-generic, lives in ops/cell_math.py (GRU rules
# identical to the original hand-derived ones; LSTM added round 3). These
# thin wrappers bind the config's cell and hidden size.
# ---------------------------------------------------------------------------

def tans_from_saved(tgates, hdot_layers, cfg, cdot_layers=None):
    """Per-layer tangent dicts from K3's saved streams (cell-dispatched)."""
    if cdot_layers is None:
        cdot_layers = [None] * len(tgates)
    return _cell_tans(cfg.cell, tgates, hdot_layers, cdot_layers, cfg.hidden_dim)


# ---------------------------------------------------------------------------
# K3: forward tangent chain kernel (ḣ + tangent gate streams given ġi = u)
# ---------------------------------------------------------------------------

def _tan_fwd_kernel(*refs, cfg: DiscriminatorConfig, tb: int, t_total: int,
                    n_weights: int):
    (u_ref, hprev_ref, gates_ref) = refs[:3]
    w_refs = refs[3 : 3 + n_weights]
    hdotprev_ref, tgates_ref, hdottop_ref = refs[3 + n_weights : 6 + n_weights]
    (hdot_scr,) = refs[6 + n_weights :]

    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    lstm = cfg.cell == "lstm"  # static
    weights_map = {n: r for n, r in zip(critic_weight_names(cfg), w_refs)}
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hdot_scr[...] = jnp.zeros_like(hdot_scr)

    def step(t, _):
        @pl.when(i * tb + t < t_total)
        def _():
            xd = u_ref[t]
            # all S*L tangent state rows entering this step
            hdotprev_ref[t] = hdot_scr[...]
            hd_new = None
            for l in range(layers):
                act = acts_from_saved(
                    [gates_ref[t, l]], [hprev_ref[t, l]], cfg,
                    [hprev_ref[t, layers + l]] if lstm else None,
                )[0]
                hd = hdot_scr[l]
                cd = hdot_scr[layers + l] if lstm else None
                w = weights_map[f"cell_l{l}.hh.kernel"][...]
                ghd = jnp.dot(hd.astype(w.dtype), w,
                              preferred_element_type=jnp.float32)
                tstream = _cell_tan_gates(cfg.cell, act, xd, ghd, hidden)
                tgates_ref[t, l] = tstream.astype(tgates_ref.dtype)
                tan = tans_from_saved([tstream], [hd], cfg,
                                      [cd] if lstm else None)[0]
                hd_new, cd_new = _state_tan_new(cfg.cell, act, tan)
                hdot_scr[l] = hd_new
                if lstm:
                    hdot_scr[layers + l] = cd_new
                if l + 1 < layers:
                    u_w = weights_map[f"ih_l{l + 1}.kernel"][...]
                    xd = jnp.dot(hd_new.astype(u_w.dtype), u_w,
                                 preferred_element_type=jnp.float32)
            hdottop_ref[t] = hd_new

        return 0

    jax.lax.fori_loop(0, tb, step, 0)


def tangent_forward(u_tm, hprev, gates, weights, cfg, tb=None,
                    interpret=None):
    """Returns (hdotprev [T,S*L,B,H], tgates [T,L,B,4H], hdottop [T,B,H])
    for the input tangent ġi = u. ``tb=None`` fits the time block to the
    batch (cell_math.fit_tb)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, b, _ = u_tm.shape
    if tb is None:
        tb = fit_tb(8, b, cfg.hidden_dim)
    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    g = gate_factor(cfg.cell)
    sl = state_slots(cfg.cell) * layers
    n_blocks = pl.cdiv(t, tb)  # uneven trailing block; masking in-kernel
    w = cast_critic_weights(weights, cfg)

    kern = functools.partial(
        _tan_fwd_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=len(w)
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = lambda tail: (lambda i: (i,) + tail)
    hdotprev, tgates, hdottop = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, b, g * hidden), blk((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, sl, b, hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, b, 4 * hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
        ] + [const(x.shape) for x in w],
        out_specs=[
            pl.BlockSpec((tb, sl, b, hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, b, 4 * hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, hidden), blk((0, 0)), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, sl, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, layers, b, 4 * hidden),
                                 critic_compute_dtype(cfg)),
            jax.ShapeDtypeStruct((t, b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((sl, b, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(u_tm, hprev, gates, *w)
    return hdotprev, tgates, hdottop


# ---------------------------------------------------------------------------
# K4: reverse tangent cotangent-chain kernel (ȧ streams)
# ---------------------------------------------------------------------------

def _tan_cot_kernel(*refs, cfg: DiscriminatorConfig, tb: int, t_total: int,
                    n_weights: int):
    (hprev_ref, hdotprev_ref, gates_ref, tgates_ref, ain_ref) = refs[:5]
    w_refs = refs[5 : 5 + n_weights]
    (adot_ref,) = refs[5 + n_weights : 6 + n_weights]
    (dhdot_scr,) = refs[6 + n_weights :]

    layers = cfg.rnn_layers
    lstm = cfg.cell == "lstm"  # static
    weights_map = {n: r for n, r in zip(critic_weight_names(cfg), w_refs)}

    class _Lazy:
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
        dhdot_scr[...] = jnp.zeros_like(dhdot_scr)

    def step(tt, _):
        t = tb - 1 - tt

        @pl.when((n_blocks - 1 - i) * tb + t < t_total)
        def _():
            dabove_dot = jnp.zeros_like(hdotprev_ref[t, 0])  # ġcot = 0
            for l in range(layers - 1, -1, -1):
                act = acts_from_saved(
                    [gates_ref[t, l]], [hprev_ref[t, l]], cfg,
                    [hprev_ref[t, layers + l]] if lstm else None,
                )[0]
                tan = tans_from_saved(
                    [tgates_ref[t, l]], [hdotprev_ref[t, l]], cfg,
                    [hdotprev_ref[t, layers + l]] if lstm else None,
                )[0]
                a = ain_ref[t, l]
                ac = ain_ref[t, layers + l] if lstm else None
                adot = dhdot_scr[l] + dabove_dot
                acdot = dhdot_scr[layers + l] if lstm else None
                adot_ref[t, l] = adot
                if lstm:
                    adot_ref[t, layers + l] = acdot
                dgi_d, dgh_d, h_chain_d, c_chain_d = _cell_tan_cots(
                    cfg.cell, a, adot, ac, acdot, act, tan
                )
                dhdot_scr[l] = h_chain_d + dot_t(
                    dgh_d, weights[f"cell_l{l}.hh.kernel"]
                )
                if lstm:
                    dhdot_scr[layers + l] = c_chain_d
                if l > 0:
                    dabove_dot = dot_t(dgi_d, weights[f"ih_l{l}.kernel"])

        return 0

    jax.lax.fori_loop(0, tb, step, 0)


def tangent_cotangent_chain(hprev, hdotprev, gates, tgates, a_in, weights, cfg,
                            tb=None, interpret=None):
    """Returns adot_in [T,S*L,B,H]: tangents of the incoming state
    cotangents (h rows first, then the LSTM cell-cotangent rows).
    ``tb=None`` fits the time block to the batch (cell_math.fit_tb)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = a_in.shape[0]
    b = a_in.shape[2]
    if tb is None:
        tb = fit_tb(8, b, cfg.hidden_dim)
    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    sl = state_slots(cfg.cell) * layers
    n_blocks = pl.cdiv(t, tb)  # uneven trailing block; masking in-kernel
    w = cast_critic_weights(weights, cfg)

    kern = functools.partial(
        _tan_cot_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=len(w)
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    rev = lambda tail: (lambda i: (n_blocks - 1 - i,) + tail)
    l4 = (tb, layers, b, 4 * hidden)
    ls = (tb, sl, b, hidden)
    (adot_in,) = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(ls, rev((0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec(ls, rev((0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec(l4, rev((0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec(l4, rev((0, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec(ls, rev((0, 0, 0)), memory_space=pltpu.VMEM),
        ] + [const(x.shape) for x in w],
        out_specs=[
            pl.BlockSpec(ls, rev((0, 0, 0)), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, sl, b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((sl, b, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(hprev, hdotprev, gates, tgates, a_in, *w)
    return adot_in


# ---------------------------------------------------------------------------
# Phase 2 (XLA): tangent weight grads + tangent input grads from the chains
# ---------------------------------------------------------------------------

def tangent_panel_grads(a_in, adot_in, gates, tgates, hprev, hdotprev,
                        weights, cfg):
    """Assemble ∂_ε ∇_θ Φ and ∂_ε ∇_gi Φ over [T*B] panels — everything is
    local per step given the saved streams; no matmul recompute.

    Returns (dweights dict keyed by critic_weight_names, dgi_d [T,B,G*H])."""
    layers = cfg.rnn_layers
    lstm = cfg.cell == "lstm"
    names = critic_weight_names(cfg)
    wd = dict(zip(names, cast_critic_weights(weights, cfg)))
    acts = acts_from_saved(
        [gates[:, l] for l in range(layers)],
        [hprev[:, l] for l in range(layers)], cfg,
        [hprev[:, layers + l] for l in range(layers)] if lstm else None,
    )
    tans = tans_from_saved(
        [tgates[:, l] for l in range(layers)],
        [hdotprev[:, l] for l in range(layers)], cfg,
        [hdotprev[:, layers + l] for l in range(layers)] if lstm else None,
    )

    def panel(x):
        return x.reshape(-1, x.shape[-1])

    def grad_mm(a, b, like):
        return jax.lax.dot_general(
            panel(a).astype(like.dtype), panel(b).astype(like.dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )

    grads = {}
    dgi0_d = None
    for l in range(layers - 1, -1, -1):
        a, adot = a_in[:, l], adot_in[:, l]
        ac = a_in[:, layers + l] if lstm else None
        acdot = adot_in[:, layers + l] if lstm else None
        dgi, dgh, _, _ = _cell_cots(cfg.cell, a, ac, acts[l])
        dgi_d, dgh_d, _, _ = _cell_tan_cots(
            cfg.cell, a, adot, ac, acdot, acts[l], tans[l]
        )
        wk = wd[f"cell_l{l}.hh.kernel"]
        grads[f"cell_l{l}.hh.kernel"] = grad_mm(acts[l]["h"], dgh_d, wk) \
            + grad_mm(tans[l]["hd"], dgh, wk)
        grads[f"cell_l{l}.hh.bias"] = col_sum(panel(dgh_d), wk)
        if l > 0:
            uk = wd[f"ih_l{l}.kernel"]
            below_hd, _ = _state_tan_new(cfg.cell, acts[l - 1], tans[l - 1])
            grads[f"ih_l{l}.kernel"] = grad_mm(acts[l - 1]["h_new"], dgi_d, uk) \
                + grad_mm(below_hd, dgi, uk)
            grads[f"ih_l{l}.bias"] = col_sum(panel(dgi_d), uk)
        else:
            dgi0_d = dgi_d.astype(critic_compute_dtype(cfg))
    return grads, dgi0_d


# ---------------------------------------------------------------------------
# Public: fused gradient penalty + the op with its second-order VJP
# ---------------------------------------------------------------------------

def fused_gradient_penalty(d_params, cfg: DiscriminatorConfig, x_hat, feats,
                           tb: int | None = None,
                           interpret: bool | None = None):
    """WGAN-GP via the fused second-order op: gp = mean((‖∇_x D(x̂)‖-1)²).

    Drop-in for train/losses.gradient_penalty on recurrent critics (zero
    initial carry — GP semantics). Differentiable wrt d_params through the
    hand-derived second-order VJP; used by train/step.py and train/tbptt.py.
    """
    from .fused_critic import compute_critic_gi, extract_critic_weights

    params = d_params.get("params", d_params)
    b, t = x_hat.shape[:2]
    if tb is None:
        tb = fit_tb(8, b, cfg.hidden_dim)  # op closes over tb

    def hoisted(xh):
        gi = compute_critic_gi(params, cfg, xh, feats)
        return jnp.swapaxes(gi, 0, 1)  # [T, B, 3H]

    gi_tm, pull = jax.vjp(hoisted, x_hat)
    w_score = params["step"]["score"]["kernel"].astype(jnp.float32)  # [H, 1]
    gcot = jnp.broadcast_to(w_score[:, 0] / t, (t, b, cfg.hidden_dim))
    weights = extract_critic_weights(params["step"]["core"], cfg)
    dgi = make_scan_input_grad(cfg, tb=tb, interpret=interpret)(gi_tm, gcot, weights)
    (g_hat,) = pull(dgi.astype(gi_tm.dtype))
    g_hat = g_hat.astype(jnp.float32)
    sq = jnp.sum(g_hat * g_hat, axis=tuple(range(1, g_hat.ndim)))
    norms = jnp.sqrt(sq + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


@functools.lru_cache(maxsize=16)
def make_scan_input_grad(cfg: DiscriminatorConfig, tb: int = 8,
                         interpret: bool | None = None):
    """input_grad(gi_tm [T,B,3H], gcot_tm [T,B,H], weights) -> dgi [T,B,3H]
    = ∇_gi ⟨gcot, htop(gi, θ)⟩ with zero initial carry (GP semantics: the
    interpolates x̂ are scored from a fresh state). Differentiable wrt all
    three inputs (the hand-derived second order documented above)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports_fused_critic(cfg, interpret):
        raise ValueError("config not supported by the fused critic kernels")

    def _forward_parts(gi_tm, gcot_tm, weights):
        b = gi_tm.shape[1]
        sl = state_slots(cfg.cell) * cfg.rnn_layers
        h0 = jnp.zeros((sl, b, cfg.hidden_dim), jnp.float32)
        _htop, hprev, gates, _hfin = critic_scan_forward(
            gi_tm, h0, weights, cfg, tb=tb, interpret=interpret
        )
        a_in, _dh0 = critic_cotangent_chain(
            gcot_tm, jnp.zeros_like(h0), hprev, gates, weights, cfg,
            tb=tb, interpret=interpret,
        )
        dgi = input_grad_from_chain(a_in, gates, hprev, cfg)
        return dgi, hprev, gates, a_in

    @jax.custom_vjp
    def input_grad(gi_tm, gcot_tm, weights):
        return _forward_parts(gi_tm, gcot_tm, weights)[0]

    def fwd(gi_tm, gcot_tm, weights):
        dgi, hprev, gates, a_in = _forward_parts(gi_tm, gcot_tm, weights)
        return dgi, (hprev, gates, a_in, weights)

    def bwd(res, u):
        hprev, gates, a_in, weights = res
        u = u.astype(jnp.float32)
        hdotprev, tgates, hdottop = tangent_forward(
            u, hprev, gates, weights, cfg, tb=tb, interpret=interpret
        )
        adot_in = tangent_cotangent_chain(
            hprev, hdotprev, gates, tgates, a_in, weights, cfg,
            tb=tb, interpret=interpret,
        )
        grads, dgi_d = tangent_panel_grads(
            a_in, adot_in, gates, tgates, hprev, hdotprev, weights, cfg
        )
        names = critic_weight_names(cfg)
        dweights = tuple(
            grads[n].reshape(w.shape).astype(w.dtype)
            for n, w in zip(names, weights)
        )
        return dgi_d.astype(critic_compute_dtype(cfg)), hdottop, dweights

    input_grad.defvjp(fwd, bwd)
    return input_grad
