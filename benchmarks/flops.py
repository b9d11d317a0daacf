"""Analytic per-step FLOP accounting for the alternating WGAN-GP step.

The architecture is closed-form, so the step's matmul FLOPs can be
counted exactly from the configs (VERDICT round-2 next #4) — no tracing,
no estimation. Counts follow the FUSED implementation's actual pass
structure (train/step.py with the dual generator pass and the merged
d-core), itemized so the per-phase numbers can be checked against the
phase profiler (benchmarks/run_phases.py).

Conventions: one matmul [m,k]@[k,n] = 2·m·k·n FLOPs; elementwise gate
algebra is ignored (VPU work, <2% of the matmul count at these sizes);
backward-of-matmul = 2 matmuls (input-grad + weight-grad panels), which
is exactly how the two-phase VJP computes them.

``mfu`` uses the v5e per-chip peak: 197 TFLOP/s bf16, 98.5 TFLOP/s f32
(one MXU pass per bf16 pair; f32 multiplies decompose to multiple
passes). The meaningful ceiling for this workload is NOT the MXU peak
but the sequential-latency floor: a T-step recurrence with per-step
matmuls too small to fill the MXU (see docs/DESIGN.md §3) — mfu is
reported because it is the standard cross-model metric, the floor
analysis is reported alongside as `latency_bound_flops_fraction`.
"""

from __future__ import annotations

import dataclasses

V5E_PEAK_FLOPS = {"bfloat16": 197e12, "float32": 98.5e12}


def _mm(m, k, n):
    return 2.0 * m * k * n


def generator_step_flops(g, b):
    """Matmul FLOPs of ONE timestep of the generator scan at batch b
    (the strictly sequential part — sets the latency floor)."""
    gh = {"gru": 3, "lstm": 4}[g.cell] * g.hidden_dim
    f = _mm(b, g.pose_dim, gh)                      # ih0_pose
    for l in range(g.rnn_layers):
        f += _mm(b, g.hidden_dim, gh)               # hh
        if l > 0:
            f += _mm(b, g.hidden_dim, gh)           # ih_l
    f += _mm(b, g.hidden_dim, g.head_hidden)        # head_fc
    f += _mm(b, g.head_hidden, g.pose_dim)          # head_out
    return f


def generator_hoisted_flops(g, b, t):
    """Encoder convs + static projection (parallel over T — MXU-friendly)."""
    gh = {"gru": 3, "lstm": 4}[g.cell] * g.hidden_dim
    f = _mm(b * t, g.enc_kernel * g.feature_dim, g.enc_dim)
    for _ in range(g.enc_layers - 1):
        f += _mm(b * t, g.enc_kernel * g.enc_dim, g.enc_dim)
    f += _mm(b * t, g.enc_dim + g.noise_dim, gh)    # ih0_static
    return f


def critic_step_flops(d, b):
    """One timestep of the critic scan at batch b (sequential part)."""
    if d.rnn_layers == 0:
        return 0.0
    gh = {"gru": 3, "lstm": 4}[d.cell] * d.hidden_dim
    f = 0.0
    for l in range(d.rnn_layers):
        f += _mm(b, d.hidden_dim, gh)
        if l > 0:
            f += _mm(b, d.hidden_dim, gh)
    return f


def critic_hoisted_flops(d, b, t):
    """Conv stack + ih0 projection + score head (parallel over T)."""
    gh = {"gru": 3, "lstm": 4}[d.cell] * d.hidden_dim
    in_dim = d.pose_dim + (d.feature_dim if d.conditional else 0)
    f = _mm(b * t, d.conv_kernel * in_dim, d.conv_dim)
    for _ in range(d.conv_layers - 1):
        f += _mm(b * t, d.conv_kernel * d.conv_dim, d.conv_dim)
    if d.rnn_layers > 0:
        f += _mm(b * t, d.conv_dim, gh)             # ih0
        f += _mm(b * t, d.hidden_dim, 1)            # score per frame
    else:
        f += _mm(b * t, d.conv_dim, d.hidden_dim)   # tcn_fc
        f += _mm(b * t, d.hidden_dim, 1)            # score per frame
    return f


def train_step_flops(gan, tc, t) -> dict:
    """Itemized matmul FLOPs of one alternating train step (the fused
    implementation's pass structure), at batch tc.batch_size and T=t.

    Returns {item: flops} plus 'total' and 'sequential' (the part inside
    per-timestep scans — the latency-bound fraction)."""
    g, d = gan.generator, gan.discriminator
    b = tc.batch_size
    nc = tc.n_critic
    items = {}
    seq = 0.0

    # --- generator: dual pass = (nc+1)·B rows forward, hoisted once per z
    rows = (nc + 1) * b
    items["g_dual_forward_seq"] = generator_step_flops(g, rows) * t
    items["g_hoisted"] = generator_hoisted_flops(g, b, t) * (nc + 1)
    seq += items["g_dual_forward_seq"]
    # G backward (diff rows only, B): chain kernel ≈ 1x the step matmuls
    # (transposed), weight-grad panels ≈ 1x over [T*B]
    items["g_backward_seq"] = generator_step_flops(g, b) * t
    items["g_backward_panels"] = generator_step_flops(g, b) * t
    items["g_hoisted_backward"] = generator_hoisted_flops(g, b, t) * 2
    seq += items["g_backward_seq"]

    # --- critic phase (per critic iter): merged d-core 3B fwd,
    # hat cotangent chain B, rf chain 2B, tangent fwd B, tangent chain B,
    # panels ≈ 2x(2B) + 3x(B) over [T*B]; conv stack 2B fwd + B fwd +
    # B pullback + 2x weight-grad panels
    per_iter = {
        "d_core_forward_seq": critic_step_flops(d, 3 * b) * t,
        "d_hat_chain_seq": critic_step_flops(d, b) * t,
        "d_rf_chain_seq": critic_step_flops(d, 2 * b) * t,
        "d_tangent_fwd_seq": critic_step_flops(d, b) * t,
        "d_tangent_chain_seq": critic_step_flops(d, b) * t,
        "d_panels": critic_step_flops(d, 2 * b) * t * 2
        + critic_step_flops(d, b) * t * 3,
        "d_hoisted": critic_hoisted_flops(d, 2 * b, t)
        + critic_hoisted_flops(d, b, t) * 2
        + critic_hoisted_flops(d, b, t) * 2,  # conv wgrads (outer grad)
    }
    for k, v in per_iter.items():
        items[k] = v * nc
        if k.endswith("_seq"):
            seq += v * nc

    # --- generator-phase critic pass: B fwd + B backward(chain+panels)
    items["gphase_critic_seq"] = critic_step_flops(d, b) * t * 2
    items["gphase_critic_panels"] = critic_step_flops(d, b) * t
    items["gphase_critic_hoisted"] = critic_hoisted_flops(d, b, t) * 3
    seq += items["gphase_critic_seq"]

    items["total"] = sum(items.values())
    items["sequential"] = seq
    return items


def transformer_fwd_flops(cfg, b, t, is_critic=False, in_dim=None):
    """Matmul FLOPs of ONE forward pass of the attention family
    (models/transformer.py) at batch b, T=t. Exact for the forward;
    attention is the 2·T²·d pair (QKᵀ and A·V)."""
    d = cfg.hidden_dim
    f = 0.0
    if is_critic:
        x_dim = in_dim
        f += _mm(b * t, cfg.conv_kernel * x_dim, cfg.conv_dim)
        for _ in range(cfg.conv_layers - 1):
            f += _mm(b * t, cfg.conv_kernel * cfg.conv_dim, cfg.conv_dim)
        f += _mm(b * t, cfg.conv_dim, d)                  # in_proj
    else:
        f += _mm(b * t, cfg.enc_kernel * cfg.feature_dim, cfg.enc_dim)
        for _ in range(cfg.enc_layers - 1):
            f += _mm(b * t, cfg.enc_kernel * cfg.enc_dim, cfg.enc_dim)
        f += _mm(b * t, cfg.enc_dim + cfg.noise_dim, d)   # in_proj
    moe = (not is_critic) and getattr(cfg, "moe_experts", 0) > 1
    if moe:
        import math

        e = cfg.moe_experts
        cap = max(1, math.ceil(cfg.moe_capacity * cfg.moe_topk * t / e))
    for _ in range(cfg.tr_blocks):
        f += 4 * _mm(b * t, d, d)                         # q, k, v, out
        f += 2 * _mm(b, t * t, d)                         # QK^T + A·V
        if moe:
            # GShard dense dispatch: the [B,T,E,C] dispatch/combine
            # einsums contract over T (an O(T*E*C) ~ O(T^2) term — the
            # known cost of static-shaped MoE), the expert FFN runs all
            # E*C slots whether or not they are filled
            f += _mm(b * t, d, e)                         # router
            f += 2 * _mm(b * e * cap, t, d)               # dispatch+combine
            f += _mm(b * e * cap, d, cfg.tr_mlp_ratio * d)  # expert in
            f += _mm(b * e * cap, cfg.tr_mlp_ratio * d, d)  # expert out
        else:
            f += _mm(b * t, d, cfg.tr_mlp_ratio * d)      # mlp_in
            f += _mm(b * t, cfg.tr_mlp_ratio * d, d)      # mlp_out
    if is_critic:
        f += _mm(b * t, d, 1)                             # score
    else:
        f += _mm(b * t, d, cfg.head_hidden)               # head_fc
        f += _mm(b * t, cfg.head_hidden, cfg.pose_dim)    # head_out
    return f


def transformer_step_flops(gan, tc, t) -> dict:
    """Approximate matmul FLOPs of one alternating train step for the
    attention family. Unlike ``train_step_flops`` (exact per the fused
    pass structure), this uses the standard backward = 2 x forward
    convention, and counts the GP second order as two extra B-row critic
    passes. Good to ~15% — enough for an MFU-scale comparison."""
    g, d = gan.generator, gan.discriminator
    b, nc = tc.batch_size, tc.n_critic
    in_dim = d.pose_dim + (d.feature_dim if d.conditional else 0)
    fg = transformer_fwd_flops(g, b, t)
    if d.arch == "transformer":
        fd = transformer_fwd_flops(d, b, t, is_critic=True, in_dim=in_dim)
    else:
        # mixed-family GAN (attn_long: flash G + TCN critic)
        fd = critic_hoisted_flops(d, b, t) + critic_step_flops(d, b) * t
    critic_iter = fg + 3 * fd * 3 + 2 * fd   # fake gen + [3B fwd+bwd] + GP
    g_phase = 3 * fg + 3 * fd                # G fwd+bwd + critic fwd+input-grad
    total = nc * critic_iter + g_phase
    return {"total": total, "sequential": 0.0}


def step_mfu(gan, tc, t, steps_per_sec: float, dtype: str) -> dict:
    """tflops/s and model-FLOPs-utilization at a measured steps/s."""
    if gan.generator.arch == "transformer":
        fl = transformer_step_flops(gan, tc, t)
    else:
        fl = train_step_flops(gan, tc, t)
    achieved = fl["total"] * steps_per_sec
    peak = V5E_PEAK_FLOPS.get(dtype, V5E_PEAK_FLOPS["bfloat16"])
    return {
        "flops_per_step": fl["total"],
        "tflops_per_sec": achieved / 1e12,
        "mfu": achieved / peak,
        "latency_bound_flops_fraction": fl["sequential"] / fl["total"],
    }
