"""Merged critic-phase core: one 3B-row fused forward for real/fake/x̂.

The D phase needs three critic quantities per step: scores for the real
batch, scores for the fake batch, and the GP's inner input-gradient on
the interpolates x̂. Unmerged they cost two sequential forward kernels
(ops/fused_critic.py at 2B rows for [real; fake], ops/fused_gp.py at B
rows for x̂). The kernel timings (benchmarks/run_tb_kernels.py,
run_dcore_bench.py) put each pass at ~0.55 ms fixed per-pass latency
plus ~0.15 ms per 32 rows — so one 3B-row pass replaces 2B+B at roughly
the 2B price, IF no XLA glue is added around it.

That glue is the whole design here (a first version that concatenated
gi to [T,3B,3H] and sliced the saved streams measured *slower* than
unmerged — the concats, residual slices and a 3B-row conv-transpose
pullback cost more than the saved pass):

- the forward kernel takes TWO input refs (gi_rf [T,2B,3H] and
  gi_hat [T,B,3H]) and concatenates rows in VMEM per time block — no
  HBM concat;
- it writes the saved streams as SEPARATE rf/hat outputs, so the
  backward chains and the [T*B]-panel XLA assemblers read exactly their
  branch with no slicing;
- the caller runs the hoisted conv stack plainly at 2B for [real; fake]
  and under ``jax.vjp`` at B rows for x̂ only, so the GP's
  conv-transpose pullback stays B-row sized.

``make_d_core`` builds the custom-VJP op:

    d_core(gi_rf, gi_hat, gcot_hat, h0_rf, weights)
        -> (htop_rf [T,2B,H], hfin_rf [L,2B,H], dgi_hat [T,B,3H])

with ``dgi_hat = ∇_gi_hat ⟨gcot_hat, htop_hat(gi_hat, θ_scan)⟩`` (zero
initial carry — GP semantics; the rf rows carry ``h0_rf`` so the TBPTT
real/fake streams chain across windows). The backward combines the
first-order cotangent chain at 2B (score branch) with the hand-derived
second-order tangent kernels at B (x̂ branch, ops/fused_gp.py) and sums
all weight gradients over [T*B] XLA panels.

Gradient correctness is gated against pure-XLA second-order autodiff in
tests/test_fused_dcore.py and at the whole-step level in
tests/test_train_step.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.configs import DiscriminatorConfig
from .fused_critic import (
    _pack_gates,
    cast_critic_weights,
    critic_compute_dtype,
    critic_cotangent_chain,
    critic_panel_grads,
    critic_weight_names,
    input_grad_from_chain,
    supports_fused_critic,
)
from .fused_gp import (
    tangent_cotangent_chain,
    tangent_forward,
    tangent_panel_grads,
)
from .cell_math import cell_step as _cell_step
from .cell_math import (fit_tb, stack_rnn_carry, state_slots,
                        unstack_rnn_carry)


def supports_d_core(cfg: DiscriminatorConfig, b: int,
                    interpret: bool | None = None) -> bool:
    """True when the merged 3B-row kernel can lower for batch size ``b``.

    The forward kernel slices its VMEM scratch at the 2B row boundary
    (``h_scr[:, :2*b]`` / ``[2*b:]``, and the per-branch stream writes) —
    compiled TPU lowering needs that boundary sublane-aligned:
    ``2*b % 8 == 0`` i.e. ``b % 4 == 0``. Interpret mode takes any size.
    Callers (train/step.py, train/tbptt.py) fall back to the unmerged
    fused composition (fused_critic_apply + fused_gradient_penalty) when
    this is False — same math, one extra forward pass.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports_fused_critic(cfg, interpret):
        return False
    return interpret or (2 * b) % 8 == 0


# ---------------------------------------------------------------------------
# Forward kernel: one scan over [rf | hat] rows, per-branch stream outputs
# ---------------------------------------------------------------------------

def _dcore_fwd_kernel(*refs, cfg: DiscriminatorConfig, tb: int, t_total: int,
                      n_weights: int, b: int):
    (gi_rf_ref, gi_hat_ref, h0_ref) = refs[:3]
    w_refs = refs[3 : 3 + n_weights]
    (htop_ref, hprev_rf_ref, gates_rf_ref, hprev_hat_ref, gates_hat_ref,
     hfin_ref) = refs[3 + n_weights : 9 + n_weights]
    (h_scr,) = refs[9 + n_weights :]

    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    lstm = cfg.cell == "lstm"  # static: branches fold at trace time
    cdt = critic_compute_dtype(cfg)
    i = pl.program_id(0)
    weights = {n: r for n, r in zip(critic_weight_names(cfg), w_refs)}

    @pl.when(i == 0)
    def _():
        # rf rows carry the incoming stream states; x̂ rows start from
        # zero (GP semantics: interpolates are scored from a fresh state)
        h_scr[:, : 2 * b] = h0_ref[...]
        h_scr[:, 2 * b :] = jnp.zeros_like(h_scr[:, 2 * b :])

    def step(t, _):
        @pl.when(i * tb + t < t_total)
        def _():
            x = jnp.concatenate(
                [gi_rf_ref[t].astype(jnp.float32),
                 gi_hat_ref[t].astype(jnp.float32)], axis=0,
            )
            hprev_rf_ref[t] = h_scr[:, : 2 * b]   # all S*L state rows
            hprev_hat_ref[t] = h_scr[:, 2 * b :]
            h_new = None
            for l in range(layers):
                h = h_scr[l]
                c = h_scr[layers + l] if lstm else None
                gh = jnp.dot(
                    h.astype(cdt), weights[f"cell_l{l}.hh.kernel"][...],
                    preferred_element_type=jnp.float32,
                ) + weights[f"cell_l{l}.hh.bias"][...]
                h_new, c_new, stream = _cell_step(cfg.cell, x, gh, h, c, hidden)
                g = stream.astype(cdt)
                gates_rf_ref[t, l] = g[: 2 * b]
                gates_hat_ref[t, l] = g[2 * b :]
                h_scr[l] = h_new
                if lstm:
                    h_scr[layers + l] = c_new
                if l + 1 < layers:
                    x = jnp.dot(
                        h_new.astype(cdt), weights[f"ih_l{l + 1}.kernel"][...],
                        preferred_element_type=jnp.float32,
                    ) + weights[f"ih_l{l + 1}.bias"][...]
            htop_ref[t] = h_new[: 2 * b]

        return 0

    jax.lax.fori_loop(0, tb, step, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        hfin_ref[...] = h_scr[:, : 2 * b]


def dcore_scan_forward(
    gi_rf: jax.Array,    # [T, 2B, G*H] time-major hoisted projection (real;fake)
    gi_hat: jax.Array,   # [T, B, G*H]  same for the interpolates x̂
    h0_rf: jax.Array,    # [S*L, 2B, H] incoming rf stream states (stacked)
    weights: tuple,
    cfg: DiscriminatorConfig,
    tb: int = 8,
    interpret: bool | None = None,
):
    """Returns (htop_rf [T,2B,H], hprev_rf, gates_rf, hprev_hat, gates_hat,
    hfin_rf) — the 3B-row forward with per-branch saved streams."""
    from .cell_math import gate_factor

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, b2, ghg = gi_rf.shape
    b = gi_hat.shape[1]
    gf = gate_factor(cfg.cell)
    assert b2 == 2 * b and ghg == gf * cfg.hidden_dim
    hidden, layers = cfg.hidden_dim, cfg.rnn_layers
    sl = state_slots(cfg.cell) * layers
    cdt = critic_compute_dtype(cfg)

    n_blocks = pl.cdiv(t, tb)  # uneven trailing block; masking in-kernel
    w = cast_critic_weights(weights, cfg)

    kern = functools.partial(
        _dcore_fwd_kernel, cfg=cfg, tb=tb, t_total=t, n_weights=len(w), b=b
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    blk = lambda tail: (lambda i: (i,) + tail)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((tb, 2 * b, gf * hidden), blk((0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, b, gf * hidden), blk((0, 0)),
                         memory_space=pltpu.VMEM),
            const((sl, 2 * b, hidden)),
        ] + [const(x.shape) for x in w],
        out_specs=[
            pl.BlockSpec((tb, 2 * b, hidden), blk((0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, sl, 2 * b, hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, 2 * b, 4 * hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, sl, b, hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, layers, b, 4 * hidden), blk((0, 0, 0)),
                         memory_space=pltpu.VMEM),
            const((sl, 2 * b, hidden)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, 2 * b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, sl, 2 * b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, layers, 2 * b, 4 * hidden), cdt),
            jax.ShapeDtypeStruct((t, sl, b, hidden), jnp.float32),
            jax.ShapeDtypeStruct((t, layers, b, 4 * hidden), cdt),
            jax.ShapeDtypeStruct((sl, 2 * b, hidden), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((sl, 3 * b, hidden), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
    )(gi_rf.astype(cdt), gi_hat.astype(cdt), h0_rf, *w)
    htop, hprev_rf, gates_rf, hprev_hat, gates_hat, hfin = outs
    return htop, hprev_rf, gates_rf, hprev_hat, gates_hat, hfin


# ---------------------------------------------------------------------------
# The custom-VJP op
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def make_d_core(cfg: DiscriminatorConfig, tb: int = 8,
                interpret: bool | None = None):
    """Build the merged critic-phase op (see module docstring).

    Differentiable wrt gi_rf, gi_hat, gcot_hat, h0_rf and the weight
    tuple; the x̂ branch's second derivative rides the hand-derived
    tangent kernels of ops/fused_gp.py, the score branch's first
    derivative rides the cotangent-chain kernel of ops/fused_critic.py.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not supports_fused_critic(cfg, interpret):
        raise ValueError("config not supported by the fused critic kernels")
    layers, hidden = cfg.rnn_layers, cfg.hidden_dim

    sl = state_slots(cfg.cell) * layers

    def _forward_parts(gi_rf, gi_hat, gcot_hat, h0_rf, weights):
        b = gi_hat.shape[1]
        htop_rf, hprev_rf, gates_rf, hprev_hat, gates_hat, hfin_rf = (
            dcore_scan_forward(
                gi_rf, gi_hat, h0_rf, weights, cfg, tb=tb, interpret=interpret
            )
        )
        a_in_hat, _dh0 = critic_cotangent_chain(
            gcot_hat, jnp.zeros((sl, b, hidden), jnp.float32),
            hprev_hat, gates_hat, weights, cfg, tb=tb, interpret=interpret,
        )
        dgi_hat = input_grad_from_chain(a_in_hat, gates_hat, hprev_hat, cfg)
        return (htop_rf, hfin_rf, dgi_hat,
                hprev_rf, gates_rf, hprev_hat, gates_hat, a_in_hat)

    @jax.custom_vjp
    def d_core(gi_rf, gi_hat, gcot_hat, h0_rf, weights):
        htop_rf, hfin_rf, dgi_hat, *_ = _forward_parts(
            gi_rf, gi_hat, gcot_hat, h0_rf, weights
        )
        return htop_rf, hfin_rf, dgi_hat

    def fwd(gi_rf, gi_hat, gcot_hat, h0_rf, weights):
        (htop_rf, hfin_rf, dgi_hat, hprev_rf, gates_rf, hprev_hat,
         gates_hat, a_in_hat) = _forward_parts(
            gi_rf, gi_hat, gcot_hat, h0_rf, weights
        )
        return (htop_rf, hfin_rf, dgi_hat), (
            hprev_rf, gates_rf, hprev_hat, gates_hat, a_in_hat, weights
        )

    def bwd(res, cots):
        hprev_rf, gates_rf, hprev_hat, gates_hat, a_in_hat, weights = res
        u_htop, u_hfin, u_dgi = cots

        # x̂ branch: hand-derived second order (Hessian-vector tangents)
        hdotprev, tgates, hdottop = tangent_forward(
            u_dgi.astype(jnp.float32), hprev_hat, gates_hat, weights, cfg,
            tb=tb, interpret=interpret,
        )
        adot_in = tangent_cotangent_chain(
            hprev_hat, hdotprev, gates_hat, tgates, a_in_hat, weights, cfg,
            tb=tb, interpret=interpret,
        )
        # score branch: first-order cotangent chain at 2B
        a_in_rf, dh0_rf = critic_cotangent_chain(
            u_htop.astype(jnp.float32), u_hfin.astype(jnp.float32),
            hprev_rf, gates_rf, weights, cfg, tb=tb, interpret=interpret,
        )

        grads_rf, dgi_rf = critic_panel_grads(
            a_in_rf, gates_rf, hprev_rf, weights, cfg
        )
        grads_hat, dgi_hat_d = tangent_panel_grads(
            a_in_hat, adot_in, gates_hat, tgates, hprev_hat, hdotprev,
            weights, cfg,
        )
        names = critic_weight_names(cfg)
        dweights = tuple(
            (grads_rf[n] + grads_hat[n]).reshape(w.shape).astype(w.dtype)
            for n, w in zip(names, weights)
        )
        cdt = critic_compute_dtype(cfg)
        return (dgi_rf.astype(cdt), dgi_hat_d.astype(cdt), hdottop,
                dh0_rf, dweights)

    d_core.defvjp(fwd, bwd)
    return d_core


def fused_d_phase(
    d_params,
    cfg: DiscriminatorConfig,
    real: jax.Array,          # [B, T, P]
    fake: jax.Array,          # [B, T, P] (already stop_gradient-ed)
    x_hat: jax.Array,         # [B, T, P]
    feats,                    # [B, T, F] or None (unconditional critic)
    carries: tuple | None = None,   # (real_carry, fake_carry) [L,B,H] or None
    return_carries: bool = False,
    tb: int | None = None,          # None: fit to batch (cell_math.fit_tb)
    interpret: bool | None = None,
):
    """The whole critic-phase loss core around one merged forward pass.

    Returns ``(s_real [B], s_fake [B], gp scalar)`` — and, with
    ``return_carries``, the final recurrent states of the real and fake
    streams (TBPTT). Drop-in for the fused_critic_apply + fused_gp
    composition in train/step.py's ``d_loss_fn``. The [real; fake] conv
    stack runs plainly at 2B rows; only x̂'s runs under ``jax.vjp`` so
    the GP conv-transpose pullback stays B-row sized.
    """
    from .fused_critic import compute_critic_gi, extract_critic_weights

    params = d_params.get("params", d_params)
    b, t = real.shape[:2]
    if tb is None:
        tb = fit_tb(8, 2 * b, cfg.hidden_dim)  # widest block: 2B rf rows
    x_rf = jnp.concatenate([real, fake], axis=0)
    f_rf = None if feats is None else jnp.concatenate([feats] * 2, axis=0)

    gi_rf = jnp.swapaxes(compute_critic_gi(params, cfg, x_rf, f_rf), 0, 1)

    def hoisted_hat(xh):
        return jnp.swapaxes(compute_critic_gi(params, cfg, xh, feats), 0, 1)

    gi_hat, pull = jax.vjp(hoisted_hat, x_hat)

    w_score = params["step"]["score"]["kernel"].astype(jnp.float32)  # [H, 1]
    b_score = params["step"]["score"]["bias"].astype(jnp.float32)
    gcot = jnp.broadcast_to(w_score[:, 0] / t, (t, b, cfg.hidden_dim))
    sl = state_slots(cfg.cell) * cfg.rnn_layers
    if carries is None:
        h0_rf = jnp.zeros((sl, 2 * b, cfg.hidden_dim), jnp.float32)
    else:
        h0_rf = jnp.concatenate(
            [stack_rnn_carry(cfg.cell, cr) for cr in carries], axis=1
        )
    weights = extract_critic_weights(params["step"]["core"], cfg)

    core = make_d_core(cfg, tb=tb, interpret=interpret)
    htop_rf, hfin_rf, dgi = core(gi_rf, gi_hat, gcot, h0_rf, weights)

    scores = jnp.mean(jnp.matmul(htop_rf, w_score) + b_score, axis=(0, 2))
    s_real, s_fake = scores[:b], scores[b:]

    (g_hat,) = pull(dgi.astype(gi_hat.dtype))
    g_hat = g_hat.astype(jnp.float32)
    sq = jnp.sum(g_hat * g_hat, axis=tuple(range(1, g_hat.ndim)))
    norms = jnp.sqrt(sq + 1e-12)
    gp = jnp.mean((norms - 1.0) ** 2)

    if return_carries:
        return s_real, s_fake, gp, (
            unstack_rnn_carry(cfg.cell, hfin_rf[:, :b], cfg.rnn_layers),
            unstack_rnn_carry(cfg.cell, hfin_rf[:, b:], cfg.rnn_layers),
        )
    return s_real, s_fake, gp
