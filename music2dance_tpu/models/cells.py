"""Scan-able recurrent cells with torch-compatible gate layout.

TPU-first structure: the *input-side* projection ``gi = x @ W_ih + b_ih``
is NOT computed here. Callers hoist it out of the time scan as one big
[B*T, I] @ [I, G*H] matmul over the whole sequence (MXU-friendly), and the
per-step cell only does the hidden-side matmul + gate nonlinearities.
Inputs that are only known inside the scan (autoregressive pose feedback,
upper-layer inputs) are projected in-scan by the caller and added to the
hoisted term.

Gate order and recurrence match torch.nn.GRU / torch.nn.LSTM exactly —
GRU gates (r, z, n) with the "reset after projection" variant
``n = tanh(i_n + r * (W_hn h + b_hn))``; LSTM gates (i, f, g, o) — so the
checkpoint converter (music2dance_tpu.ckpt.torch_convert) is a pure
transpose, never a gate permutation (SURVEY.md §7 hard part #5).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def num_gates(cell: str) -> int:
    if cell == "gru":
        return 3
    if cell == "lstm":
        return 4
    raise ValueError(f"unknown cell type: {cell}")


class GRUCell(nn.Module):
    """h, gi [B, 3H] -> h. Carry is h [B, H]."""

    hidden: int
    dtype: str = "float32"  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, h, gi):
        gh = nn.Dense(3 * self.hidden, name="hh", dtype=self.dtype)(h)
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = nn.sigmoid(i_r + h_r)
        z = nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class LSTMCell(nn.Module):
    """(h, c), gi [B, 4H] -> (h, c). Carry is the (h, c) pair."""

    hidden: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, carry, gi):
        h, c = carry
        gh = nn.Dense(4 * self.hidden, name="hh", dtype=self.dtype)(h)
        i_i, i_f, i_g, i_o = jnp.split(gi, 4, axis=-1)
        h_i, h_f, h_g, h_o = jnp.split(gh, 4, axis=-1)
        i = nn.sigmoid(i_i + h_i)
        f = nn.sigmoid(i_f + h_f)
        g = jnp.tanh(i_g + h_g)
        o = nn.sigmoid(i_o + h_o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new)


class RNNCore(nn.Module):
    """A stack of ``layers`` recurrent cells, advanced one timestep.

    Carry: GRU -> hs [L, B, H]; LSTM -> (hs [L, B, H], cs [L, B, H]).
    ``gi0`` is the hoisted layer-0 input projection [B, G*H]; layers > 0
    project the hidden state of the layer below in-scan (that input cannot
    be hoisted — it depends on the recurrence).
    Returns (new_carry, h_top [B, H]).
    """

    hidden: int
    layers: int
    cell: str = "gru"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, carry, gi0):
        g = num_gates(self.cell)
        new_h, new_c = [], []
        x_proj = gi0
        for l in range(self.layers):
            if self.cell == "gru":
                h_l = carry[l]
                h_new = GRUCell(self.hidden, self.dtype, name=f"cell_l{l}")(h_l, x_proj)
                new_h.append(h_new)
                below = h_new
            else:
                h_l, c_l = carry[0][l], carry[1][l]
                h_new, c_new = LSTMCell(self.hidden, self.dtype, name=f"cell_l{l}")((h_l, c_l), x_proj)
                new_h.append(h_new)
                new_c.append(c_new)
                below = h_new
            if l + 1 < self.layers:
                x_proj = nn.Dense(g * self.hidden, name=f"ih_l{l + 1}", dtype=self.dtype)(below)
        h_stack = jnp.stack(new_h, axis=0)
        if self.cell == "gru":
            return h_stack, below
        return (h_stack, jnp.stack(new_c, axis=0)), below


def init_rnn_carry(cell: str, layers: int, batch: int, hidden: int, dtype=jnp.float32):
    hs = jnp.zeros((layers, batch, hidden), dtype)
    if cell == "gru":
        return hs
    return (hs, jnp.zeros((layers, batch, hidden), dtype))
