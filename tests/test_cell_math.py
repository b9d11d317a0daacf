"""ops/cell_math.py algebra vs jax autodiff — every hand-derived rule
(forward, first-order cotangents, forward tangents, tangents-of-cotangents)
is checked against jax.vjp/jax.jvp on a plain XLA cell step, for BOTH
cells. A sign slip in the LSTM Hessian-vector algebra cannot survive this
file; the kernels then only have to wire the algebra correctly (their own
parity suites: tests/test_fused_*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.ops import cell_math as cm

B, H = 4, 8


def _mk(cell, seed=0):
    rng = np.random.default_rng(seed)
    g = cm.gate_factor(cell)
    gi = jnp.asarray(rng.standard_normal((B, g * H)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((H, g * H)) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((g * H,)) * 0.1, jnp.float32)
    h = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    return gi, w, bias, h, c


def _ref_step(cell, gi, w, bias, h, c):
    """Plain XLA cell step (the flax cells' math, written open)."""
    gh = h @ w + bias
    if cell == "gru":
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h, None
    i_i, i_f, i_g, i_o = jnp.split(gi, 4, axis=-1)
    h_i, h_f, h_g, h_o = jnp.split(gh, 4, axis=-1)
    i = jax.nn.sigmoid(i_i + h_i)
    f = jax.nn.sigmoid(i_f + h_f)
    g = jnp.tanh(i_g + h_g)
    o = jax.nn.sigmoid(i_o + h_o)
    c_new = f * c + i * g
    return o * jnp.tanh(c_new), c_new


def _manual_step(cell, gi, w, bias, h, c):
    gh = h @ w + bias
    return cm.cell_step(cell, gi, gh, h, c, H)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_forward_matches_reference(cell):
    gi, w, bias, h, c = _mk(cell)
    h_ref, c_ref = _ref_step(cell, gi, w, bias, h, c)
    h_new, c_new, stream = _manual_step(cell, gi, w, bias, h, c)
    np.testing.assert_allclose(h_new, h_ref, rtol=1e-6)
    if cell == "lstm":
        np.testing.assert_allclose(c_new, c_ref, rtol=1e-6)
    assert stream.shape == (B, 4 * H)
    # acts_from_saved reconstructs h_new/c_new from the stream alone
    act = cm.acts_from_saved(cell, [stream], [h], [c], H)[0]
    np.testing.assert_allclose(act["h_new"], h_ref, rtol=1e-6)
    if cell == "lstm":
        np.testing.assert_allclose(act["c_new"], c_ref, rtol=1e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_first_order_cotangents_match_vjp(cell):
    gi, w, bias, h, c = _mk(cell)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    a_c = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)

    def fn(gi_, h_, c_):
        h_new, c_new = _ref_step(cell, gi_, w, bias, h_, c_)
        out = jnp.sum(h_new * a)
        if cell == "lstm":
            out = out + jnp.sum(c_new * a_c)
        return out

    dgi_ref, dh_ref, dc_ref = jax.grad(fn, argnums=(0, 1, 2))(gi, h, c)

    _, _, stream = _manual_step(cell, gi, w, bias, h, c)
    act = cm.acts_from_saved(cell, [stream], [h], [c], H)[0]
    dgi, dgh, h_part, c_part = cm.gate_cotangents(cell, a, a_c, act)
    dh = h_part + dgh @ w.T
    np.testing.assert_allclose(dgi, dgi_ref, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(dh, dh_ref, rtol=2e-5, atol=1e-6)
    if cell == "lstm":
        np.testing.assert_allclose(c_part, dc_ref, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_forward_tangents_match_jvp(cell):
    gi, w, bias, h, c = _mk(cell)
    rng = np.random.default_rng(2)
    xd = jnp.asarray(rng.standard_normal(gi.shape), jnp.float32)
    hd = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    cd = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)

    def fn(gi_, h_, c_):
        h_new, c_new = _ref_step(cell, gi_, w, bias, h_, c_)
        return (h_new, c_new) if cell == "lstm" else h_new

    if cell == "lstm":
        _, (hd_ref, cd_ref) = jax.jvp(fn, (gi, h, c), (xd, hd, cd))
    else:
        _, hd_ref = jax.jvp(fn, (gi, h, c), (xd, hd, cd))
        cd_ref = None

    _, _, stream = _manual_step(cell, gi, w, bias, h, c)
    act = cm.acts_from_saved(cell, [stream], [h], [c], H)[0]
    ghd = hd @ w
    tstream = cm.tangent_gates(cell, act, xd, ghd, H)
    tan = cm.tans_from_saved(cell, [tstream], [hd], [cd], H)[0]
    hd_new, cd_new = cm.state_tangent_new(cell, act, tan)
    np.testing.assert_allclose(hd_new, hd_ref, rtol=2e-5, atol=1e-6)
    if cell == "lstm":
        np.testing.assert_allclose(cd_new, cd_ref, rtol=2e-5, atol=1e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_tangent_cotangents_match_jvp_of_vjp(cell):
    """The K4 algebra: tangent of the cotangent rules along an input
    direction == jax.jvp of the jax.vjp — the Hessian-vector identity the
    second-order GP kernels are built on."""
    gi, w, bias, h, c = _mk(cell)
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    a_c = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    adot = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    acdot = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    xd = jnp.asarray(rng.standard_normal(gi.shape), jnp.float32)
    hd = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)
    cd = jnp.asarray(rng.standard_normal((B, H)), jnp.float32)

    def cots(gi_, h_, c_, a_, ac_):
        """(dgi, dh, dc) of <a, h_new> + <ac, c_new> via autodiff."""
        def fn(gi__, h__, c__):
            h_new, c_new = _ref_step(cell, gi__, w, bias, h__, c__)
            out = jnp.sum(h_new * a_)
            if cell == "lstm":
                out = out + jnp.sum(c_new * ac_)
            return out

        return jax.grad(fn, argnums=(0, 1, 2))(gi_, h_, c_)

    # reference: directional derivative of the cotangent map along
    # (xd, hd, cd, adot, acdot)
    _, (dgi_d_ref, dh_d_ref, dc_d_ref) = jax.jvp(
        cots, (gi, h, c, a, a_c), (xd, hd, cd, adot, acdot)
    )

    _, _, stream = _manual_step(cell, gi, w, bias, h, c)
    act = cm.acts_from_saved(cell, [stream], [h], [c], H)[0]
    ghd = hd @ w
    tstream = cm.tangent_gates(cell, act, xd, ghd, H)
    tan = cm.tans_from_saved(cell, [tstream], [hd], [cd], H)[0]

    dgi_d, dgh_d, h_chain_d, c_chain_d = cm.tangent_cotangents(
        cell, a, adot, a_c if cell == "lstm" else None,
        acdot if cell == "lstm" else None, act, tan,
    )
    dh_d = h_chain_d + dgh_d @ w.T
    np.testing.assert_allclose(dgi_d, dgi_d_ref, rtol=5e-5, atol=1e-5)
    np.testing.assert_allclose(dh_d, dh_d_ref, rtol=5e-5, atol=1e-5)
    if cell == "lstm":
        np.testing.assert_allclose(c_chain_d, dc_d_ref, rtol=5e-5, atol=1e-5)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_carry_stacking_round_trip(cell):
    layers = 3
    rng = np.random.default_rng(4)
    hs = jnp.asarray(rng.standard_normal((layers, B, H)), jnp.float32)
    cs = jnp.asarray(rng.standard_normal((layers, B, H)), jnp.float32)
    carry = hs if cell == "gru" else (hs, cs)
    stacked = cm.stack_rnn_carry(cell, carry)
    assert stacked.shape[0] == cm.state_slots(cell) * layers
    back = cm.unstack_rnn_carry(cell, stacked, layers)
    if cell == "gru":
        np.testing.assert_array_equal(back, hs)
    else:
        np.testing.assert_array_equal(back[0], hs)
        np.testing.assert_array_equal(back[1], cs)


def test_fit_tb_preserves_headline_defaults_and_halves_at_scale():
    from music2dance_tpu.ops.cell_math import fit_tb

    # headline-scale batches: the resolved tb IS the old fixed default,
    # so the adaptive policy cannot change any existing compiled program
    assert fit_tb(8, 2 * 32) == 8      # dcore rf rows at B=32
    assert fit_tb(8, 2 * 64) == 8      # ... at B=64 (measured-good)
    assert fit_tb(4, 96) == 4          # dual rows at B=32, n_critic=2
    assert fit_tb(4, 256) == 4         # decode at B=256 (measured-good)
    # past the envelope: halve until tb*rows <= 1024
    assert fit_tb(8, 2 * 128) == 4     # the B=128 scoped-VMEM OOM case
    assert fit_tb(8, 2 * 256) == 2
    assert fit_tb(4, 512) == 2
    assert fit_tb(8, 100_000) == 1     # never below 1
    # width-aware: a 2x-wider model shrinks tb like a 2x batch would
    assert fit_tb(8, 2 * 64, hidden=512) == 8
    assert fit_tb(8, 2 * 64, hidden=1024) == 4
    assert fit_tb(8, 2 * 32, hidden=2048) == 4
