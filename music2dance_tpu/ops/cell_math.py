"""Cell-generic recurrence algebra for the fused kernel bank (GRU + LSTM).

One definition of each cell's forward step, first-order cotangent rules,
and second-order (Hessian-vector) tangent rules, consumed by every fused
kernel (fused_generator*.py, fused_critic.py, fused_gp.py, fused_gdual.py,
fused_dcore.py). The math matches models/cells.py exactly: torch gate
order — GRU (r, z, n) with n = tanh(i_n + r·(W_hn h + b_hn)), LSTM
(i, f, g, o) with c' = f·c + i·g, h' = o·tanh(c').

State-stacking convention: kernels carry recurrent state as ONE array of
shape [S·L, B, H] — h for layers 0..L-1, then (LSTM only) c for layers
L..2L-1 (S = ``state_slots``). GRU shapes are therefore bit-identical to
the original GRU-only kernels; LSTM doubles the state rows and the
per-step chain carries (dh, dc) / (ḣ, ċ) pairs. Saved streams stay 4H
wide for both cells: GRU packs [r|z|n|hn], LSTM packs [i|f|g|o] (c' and
tanh(c') are cheap VPU recomputes from the stream + the c state row —
save-don't-recompute applies to matmuls, not elementwise ops).

Cotangent rules (per layer, incoming hidden cotangent a, cell cotangent
a_c for LSTM):

GRU (see gru_math.py, unchanged):
    dn = a(1−z)(1−n²); dz = a(h−n)z(1−z); dr = dn·hn·r(1−r)
    dgi = [dr|dz|dn]; dgh = [dr|dz|dn·r]; h-chain partial = a·z

LSTM:
    tc = tanh(c'); do = a·tc·o(1−o)
    dc_tot = a_c + a·o·(1−tc²)
    di = dc_tot·g·i(1−i); df = dc_tot·c·f(1−f); dg = dc_tot·i·(1−g²)
    dgi = dgh = [di|df|dg|do]; h-chain partial = 0 (h only enters via gh);
    c-chain partial = dc_tot·f

Tangent (ε-derivative) rules are the literal directional derivatives of
the above — verified against jax.jvp/jax.grad-of-grad on the flax cells in
tests/test_cell_math.py, so a sign slip here cannot survive CI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gru_math import gate_cotangents as _gru_gate_cotangents
from .gru_math import gru_gates as _gru_gates


def fit_tb(default: int, rows: int, hidden: int = 512) -> int:
    """Time-block size that keeps scoped VMEM bounded at large shapes.

    Every chain kernel's per-grid-step footprint scales with
    ``tb * rows * hidden`` (block shapes are [tb, rows, k*hidden]); tb
    anywhere in 2..32 is perf-neutral (benchmarks/run_tb_kernels.py), so
    halve it as the footprint grows. The envelope is measured, not
    derived: at hidden 512 the merged d-core at tb=8 x 2B=128 rows
    (batch 64) compiles, while tb=8 x 2B=256 (batch 128) overflows the
    64 MB scoped-vmem limit by 1.07 MB — tb*rows <= 1024 at that width
    keeps the worst kernel at the known-good footprint, and the cap
    scales inversely with ``hidden`` so wider models shrink tb the same
    way bigger batches do. Returns ``default`` unchanged for
    headline-scale shapes.
    """
    tb = default
    while tb > 1 and tb * rows * hidden > 1024 * 512:
        tb //= 2
    return tb


# The fused kernels hold ALL scan weights VMEM-resident for the whole
# grid (that is the design: per-step cost = raw matmul latency, zero
# weight DMA). That puts a hard ceiling on model WIDTH: at hidden=2048
# (GRU bf16) the gate matrices alone are 3 x 24 MB and the dual-VJP
# kernel was measured to need 89.16 MB of scoped VMEM against the 64 MB
# limit (compile-time OOM, benchmarks/run_width_scaling.py). hidden=1024
# bf16 compiles and runs (measured, 72.4 steps/s, MFU 0.445). The
# envelope below models the footprint as weights + a stream allowance:
# fit_tb caps every pipelined block at 512K elements (<= 2 MB f32), and
# the worst kernel double-buffers ~4 such streams => 16 MB.
VMEM_LIMIT_BYTES = 60 * 2**20          # 64 MB scoped limit minus slack
STREAM_ALLOWANCE_BYTES = 16 * 2**20


def rnn_weights_vmem_bytes(layers: int, hidden: int, cell: str,
                           cdt_bytes: int) -> int:
    """VMEM bytes of a fused scan core's resident weights: per layer the
    hidden-side gate matrix [H, G*H] (+ f32 bias), plus the in-scan
    upper-layer input projections [H, G*H] for layers > 0."""
    g = gate_factor(cell)
    per_mat = hidden * g * hidden * cdt_bytes + g * hidden * 4
    n_mats = layers + max(0, layers - 1)
    return n_mats * per_mat


def width_fits_vmem(weight_bytes: int) -> bool:
    return weight_bytes + STREAM_ALLOWANCE_BYTES <= VMEM_LIMIT_BYTES


def state_slots(cell: str) -> int:
    """Rows of recurrent state per layer: GRU 1 (h), LSTM 2 (h, c)."""
    if cell == "gru":
        return 1
    if cell == "lstm":
        return 2
    raise ValueError(f"unknown cell type: {cell}")


def gate_factor(cell: str) -> int:
    """gi/gh width in units of H: GRU 3, LSTM 4."""
    return 3 if cell == "gru" else 4


def stream_factor(cell: str) -> int:
    """Saved forward gate-stream width in units of H (both cells: 4)."""
    return 4


# ---------------------------------------------------------------------------
# Forward step
# ---------------------------------------------------------------------------

def lstm_gates(x, gh, hidden):
    """Pre-activations -> (i, f, g, o), torch gate order."""
    s = jax.nn.sigmoid
    a_i = x[..., :hidden] + gh[..., :hidden]
    a_f = x[..., hidden : 2 * hidden] + gh[..., hidden : 2 * hidden]
    a_g = x[..., 2 * hidden : 3 * hidden] + gh[..., 2 * hidden : 3 * hidden]
    a_o = x[..., 3 * hidden :] + gh[..., 3 * hidden :]
    return s(a_i), s(a_f), jnp.tanh(a_g), s(a_o)


def cell_step(cell: str, x, gh, h, c, hidden):
    """One cell forward: pre-activations + state -> (h_new, c_new, stream).

    ``c`` is ignored for GRU (c_new returns None). ``stream`` is the
    [..., 4H] saved forward stream ([r|z|n|hn] / [i|f|g|o])."""
    if cell == "gru":
        r, z, n, hn = _gru_gates(x, gh, hidden)
        h_new = (1.0 - z) * n + z * h
        return h_new, None, jnp.concatenate([r, z, n, hn], axis=-1)
    i, f, g, o = lstm_gates(x, gh, hidden)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, jnp.concatenate([i, f, g, o], axis=-1)


def acts_from_saved(cell: str, gates, hprev_layers, cprev_layers, hidden):
    """Per-layer act dicts from saved streams — NO matmuls.

    ``gates``: list of [..., 4H] streams (possibly bf16); ``hprev_layers``
    / ``cprev_layers``: the h / c state rows entering each step (cprev
    ignored for GRU). Backward/tangent kernels and the XLA panel
    assemblers consume this instead of re-running the hidden-side matmul."""
    acts = []
    for l in range(len(gates)):
        g4 = gates[l].astype(jnp.float32)
        p0, p1, p2, p3 = (g4[..., :hidden], g4[..., hidden : 2 * hidden],
                          g4[..., 2 * hidden : 3 * hidden], g4[..., 3 * hidden :])
        h = hprev_layers[l]
        if cell == "gru":
            r, z, n, hn = p0, p1, p2, p3
            acts.append({"h": h, "hn": hn, "r": r, "z": z, "n": n,
                         "h_new": (1.0 - z) * n + z * h})
        else:
            i, f, g_, o = p0, p1, p2, p3
            c = cprev_layers[l]
            c_new = f * c + i * g_
            tc = jnp.tanh(c_new)
            acts.append({"h": h, "c": c, "i": i, "f": f, "g": g_, "o": o,
                         "tc": tc, "c_new": c_new, "h_new": o * tc})
    return acts


# ---------------------------------------------------------------------------
# First-order cotangents
# ---------------------------------------------------------------------------

def gate_cotangents(cell: str, a, a_c, act):
    """Incoming (hidden, cell) cotangents -> (dgi, dgh, h_part, c_part).

    ``a_c`` is ignored for GRU (c_part returns None). ``h_part`` is the
    direct (non-matmul) h-chain term; the caller adds dgh @ Whhᵀ to it.
    ``c_part`` is the full c-chain term (c never passes through a matmul)."""
    if cell == "gru":
        dgi, dgh, h_part = _gru_gate_cotangents(a, act)
        return dgi, dgh, h_part, None
    i, f, g, o = act["i"], act["f"], act["g"], act["o"]
    c, tc = act["c"], act["tc"]
    do = a * tc * o * (1.0 - o)
    dc_tot = a_c + a * o * (1.0 - tc * tc)
    di = dc_tot * g * i * (1.0 - i)
    df = dc_tot * c * f * (1.0 - f)
    dg = dc_tot * i * (1.0 - g * g)
    dgate = jnp.concatenate([di, df, dg, do], axis=-1)
    return dgate, dgate, jnp.zeros_like(a), dc_tot * f


# ---------------------------------------------------------------------------
# Forward tangents (JVP) — the K3 algebra
# ---------------------------------------------------------------------------

def tangent_gates(cell: str, act, xd, ghd, hidden):
    """JVP of the gate nonlinearities from primal acts + pre-activation
    tangents. Returns the packed tangent stream [..., 4H]:
    GRU [ṙ|ż|ṅ|ġh_n] (ġh_n is carried because ṅ needs it downstream),
    LSTM [i̇|ḟ|ġ|ȯ]."""
    if cell == "gru":
        r, z, n, hn = act["r"], act["z"], act["n"], act["hn"]
        xd_r, xd_z, xd_n = (xd[..., :hidden], xd[..., hidden : 2 * hidden],
                            xd[..., 2 * hidden :])
        ghd_r, ghd_z, ghd_n = (ghd[..., :hidden], ghd[..., hidden : 2 * hidden],
                               ghd[..., 2 * hidden :])
        rd = r * (1.0 - r) * (xd_r + ghd_r)
        zd = z * (1.0 - z) * (xd_z + ghd_z)
        nd = (1.0 - n * n) * (xd_n + rd * hn + r * ghd_n)
        return jnp.concatenate([rd, zd, nd, ghd_n], axis=-1)
    i, f, g, o = act["i"], act["f"], act["g"], act["o"]
    ad = xd + ghd
    ad_i, ad_f, ad_g, ad_o = (ad[..., :hidden], ad[..., hidden : 2 * hidden],
                              ad[..., 2 * hidden : 3 * hidden],
                              ad[..., 3 * hidden :])
    i_d = i * (1.0 - i) * ad_i
    f_d = f * (1.0 - f) * ad_f
    g_d = (1.0 - g * g) * ad_g
    o_d = o * (1.0 - o) * ad_o
    return jnp.concatenate([i_d, f_d, g_d, o_d], axis=-1)


def tans_from_saved(cell: str, tgates, hdot_layers, cdot_layers, hidden):
    """Per-layer tangent dicts from K3's saved tangent streams."""
    tans = []
    for l in range(len(tgates)):
        g4 = tgates[l].astype(jnp.float32)
        p0, p1, p2, p3 = (g4[..., :hidden], g4[..., hidden : 2 * hidden],
                          g4[..., 2 * hidden : 3 * hidden], g4[..., 3 * hidden :])
        if cell == "gru":
            tans.append({"hd": hdot_layers[l], "rd": p0, "zd": p1, "nd": p2,
                         "ghd_n": p3})
        else:
            tans.append({"hd": hdot_layers[l], "cd": cdot_layers[l],
                         "id": p0, "fd": p1, "gd": p2, "od": p3})
    return tans


def state_tangent_new(cell: str, act, tan):
    """Tangents of (h_new, c_new) from primal acts + gate tangents.
    Returns (ḣ_new, ċ_new) with ċ_new None for GRU."""
    if cell == "gru":
        hd_new = (-tan["zd"] * act["n"] + (1.0 - act["z"]) * tan["nd"]
                  + tan["zd"] * act["h"] + act["z"] * tan["hd"])
        return hd_new, None
    cd_new = (tan["fd"] * act["c"] + act["f"] * tan["cd"]
              + tan["id"] * act["g"] + act["i"] * tan["gd"])
    tc = act["tc"]
    hd_new = tan["od"] * tc + act["o"] * (1.0 - tc * tc) * cd_new
    return hd_new, cd_new


# ---------------------------------------------------------------------------
# Second-order: tangents of the cotangent rules — the K4 algebra
# ---------------------------------------------------------------------------

def tangent_cotangents(cell: str, a, adot, a_c, acdot, act, tan):
    """ε-derivatives of ``gate_cotangents``: given primal cotangents
    (a, a_c), their tangents (adot, acdot) and the forward tangents, return
    (dgi_d, dgh_d, h_chain_d, c_chain_d) — the tangent of every cotangent
    output. ``a_c``/``acdot``/``c_chain_d`` are None for GRU."""
    if cell == "gru":
        h, hn, r, z, n = act["h"], act["hn"], act["r"], act["z"], act["n"]
        hd, rd, zd, nd, ghd_n = (tan["hd"], tan["rd"], tan["zd"], tan["nd"],
                                 tan["ghd_n"])
        dn = a * (1.0 - z) * (1.0 - n * n)
        dn_d = adot * (1.0 - z) * (1.0 - n * n) - a * zd * (1.0 - n * n) \
            - 2.0 * a * (1.0 - z) * n * nd
        dz_d = adot * (h - n) * z * (1.0 - z) + a * (hd - nd) * z * (1.0 - z) \
            + a * (h - n) * zd * (1.0 - 2.0 * z)
        dr_d = dn_d * hn * r * (1.0 - r) + dn * ghd_n * r * (1.0 - r) \
            + dn * hn * rd * (1.0 - 2.0 * r)
        dgi_d = jnp.concatenate([dr_d, dz_d, dn_d], axis=-1)
        dgh_d = jnp.concatenate([dr_d, dz_d, dn_d * r + dn * rd], axis=-1)
        return dgi_d, dgh_d, adot * z + a * zd, None

    i, f, g, o = act["i"], act["f"], act["g"], act["o"]
    c, tc = act["c"], act["tc"]
    id_, fd, gd, od = tan["id"], tan["fd"], tan["gd"], tan["od"]
    cd = tan["cd"]
    _, cd_new = state_tangent_new(cell, act, tan)
    tcd = (1.0 - tc * tc) * cd_new

    dc_tot = a_c + a * o * (1.0 - tc * tc)
    do_d = adot * tc * o * (1.0 - o) + a * tcd * o * (1.0 - o) \
        + a * tc * od * (1.0 - 2.0 * o)
    dc_tot_d = acdot + adot * o * (1.0 - tc * tc) + a * od * (1.0 - tc * tc) \
        - 2.0 * a * o * tc * tcd
    di_d = dc_tot_d * g * i * (1.0 - i) + dc_tot * gd * i * (1.0 - i) \
        + dc_tot * g * id_ * (1.0 - 2.0 * i)
    df_d = dc_tot_d * c * f * (1.0 - f) + dc_tot * cd * f * (1.0 - f) \
        + dc_tot * c * fd * (1.0 - 2.0 * f)
    dg_d = dc_tot_d * i * (1.0 - g * g) + dc_tot * id_ * (1.0 - g * g) \
        - 2.0 * dc_tot * i * g * gd
    dgate_d = jnp.concatenate([di_d, df_d, dg_d, do_d], axis=-1)
    c_chain_d = dc_tot_d * f + dc_tot * fd
    return dgate_d, dgate_d, jnp.zeros_like(a), c_chain_d


# ---------------------------------------------------------------------------
# Model-carry <-> stacked-state conversion (the [S·L, B, H] convention)
# ---------------------------------------------------------------------------

def stack_rnn_carry(cell: str, rnn_carry):
    """Model-format carry (hs | (hs, cs)) -> stacked [S·L, B, H]."""
    if cell == "gru":
        return rnn_carry
    return jnp.concatenate(rnn_carry, axis=0)


def unstack_rnn_carry(cell: str, stacked, layers: int):
    """Stacked [S·L, B, H] -> model-format carry (hs | (hs, cs))."""
    if cell == "gru":
        return stacked
    return stacked[:layers], stacked[layers:]
