"""Shared GRU gate algebra for the fused kernel bank.

One definition of the torch-gate-order GRU forward, its cotangent rules,
and the save-don't-recompute stream packing, used by the generator
kernels (fused_generator*.py), the critic kernels (fused_critic.py) and
the second-order GP kernels (fused_gp.py). The math matches
models/cells.GRUCell exactly (n = tanh(i_n + r * (W_hn h + b_hn)))."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gru_gates(x, gh, hidden):
    """Pre-activations (x input-side, gh hidden-side) -> (r, z, n, hn)."""
    i_r, i_z, i_n = x[..., :hidden], x[..., hidden:2 * hidden], x[..., 2 * hidden:]
    h_r, h_z, h_n = gh[..., :hidden], gh[..., hidden:2 * hidden], gh[..., 2 * hidden:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return r, z, n, h_n


def gate_cotangents(a, act):
    """Incoming hidden cotangent ``a`` -> (dgi, dgh, dh_prev_partial).

    ``act`` needs fields {h, hn, r, z, n}. dh_prev_partial is a*z; the
    dgh @ Whh^T chain term is added by the caller."""
    r, z, n, h, hn = act["r"], act["z"], act["n"], act["h"], act["hn"]
    dn_pre = a * (1.0 - z) * (1.0 - n * n)
    dz_pre = a * (h - n) * z * (1.0 - z)
    dr_pre = dn_pre * hn * r * (1.0 - r)
    dgi = jnp.concatenate([dr_pre, dz_pre, dn_pre], axis=-1)
    dgh = jnp.concatenate([dr_pre, dz_pre, dn_pre * r], axis=-1)
    return dgi, dgh, a * z


def pack_gates(r, z, n, hn):
    """[r|z|n|hn] along the last axis — the saved forward gate stream."""
    return jnp.concatenate([r, z, n, hn], axis=-1)


def acts_from_saved(gates, hprev_layers, hidden):
    """Per-layer act dicts from saved gate streams — NO matmuls.

    ``gates``: sequence of [..., 4H] = [r|z|n|hn] arrays; h_new is
    reconstructed elementwise. Backward/tangent kernels and the XLA panel
    assemblers consume this instead of re-running the hidden-side matmul
    (the saved streams DMA-pipeline with compute; the matmul was the cost)."""
    acts = []
    for l in range(len(gates)):
        # streams may be stored in bf16 (compute dtype); chain math is f32
        g = gates[l].astype(jnp.float32)
        r, z, n, hn = (g[..., :hidden], g[..., hidden:2 * hidden],
                       g[..., 2 * hidden:3 * hidden], g[..., 3 * hidden:])
        h = hprev_layers[l]
        acts.append({"h": h, "hn": hn, "r": r, "z": z, "n": n,
                     "h_new": (1.0 - z) * n + z * h})
    return acts
