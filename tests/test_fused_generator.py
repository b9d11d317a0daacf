"""Fused generator kernel vs the XLA scan: exact forward equivalence
(interpret mode on CPU; the compiled TPU path is exercised by
benchmarks/run_fused.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import Generator, GeneratorConfig, JointLayout
from music2dance_tpu.ops.fused_generator import (
    compute_gi_static,
    fused_apply,
    supports_fused,
)

LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def make_gen(layers=2, hidden=32, residual=True, cell="gru"):
    cfg = GeneratorConfig(
        layout=LAYOUT, feature_dim=13, noise_dim=8, enc_dim=16, enc_layers=2,
        enc_kernel=3, hidden_dim=hidden, rnn_layers=layers, cell=cell,
        head_hidden=16, residual_pose=residual,
    )
    gen = Generator(cfg)
    feats = jax.random.normal(jax.random.key(0), (4, 21, 13))  # T=21 ragged vs tb=8
    z = jax.random.normal(jax.random.key(1), (4, 8))
    params = gen.init(jax.random.key(2), feats, z)
    return cfg, gen, params, feats, z


def test_gi_static_matches_flax():
    cfg, gen, params, feats, z = make_gen()
    # reference gi_static via a forward with zeroed step weights is awkward;
    # instead check the full fused forward below — here just shape/finite
    gi = compute_gi_static(params["params"], cfg, feats, z)
    assert gi.shape == (4, 21, 3 * cfg.hidden_dim)
    assert np.isfinite(np.asarray(gi)).all()


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
@pytest.mark.parametrize("residual", [True, False])
def test_fused_forward_equals_xla_scan(layers, residual, cell):
    cfg, gen, params, feats, z = make_gen(layers=layers, residual=residual,
                                          cell=cell)
    ref = gen.apply(params, feats, z)
    out = fused_apply(params, cfg, feats, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fused_forward_with_carry(cell):
    cfg, gen, params, feats, z = make_gen(cell=cell)
    ref, ref_carry = gen.apply(params, feats, z, return_carry=True)
    out, (h_fin, p_fin) = fused_apply(params, cfg, feats, z, return_carry=True)
    for a, b in zip(jax.tree.leaves(h_fin), jax.tree.leaves(ref_carry[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    h_fin = jax.tree.leaves(h_fin)[0]          # shape check below reuses
    ref_carry = (jax.tree.leaves(ref_carry[0])[0], ref_carry[1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_fin), np.asarray(ref_carry[0]), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p_fin), np.asarray(ref_carry[1]), rtol=1e-5, atol=1e-5)

    # continue from the carry: fused(first half) + fused(second half) == full
    h = 12
    cfg1, gen1, params1, feats1, z1 = make_gen()
    cfg1 = GeneratorConfig(**{**cfg1.__dict__, "enc_kernel": 1})
    gen1 = Generator(cfg1)
    params1 = gen1.init(jax.random.key(2), feats1, z1)
    full = fused_apply(params1, cfg1, feats1, z1)
    first, carry = fused_apply(params1, cfg1, feats1[:, :h], z1, return_carry=True)
    second = fused_apply(params1, cfg1, feats1[:, h:], z1, carry=carry)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([first, second], axis=1)),
        np.asarray(full), rtol=1e-5, atol=1e-5,
    )


def test_supports_fused_guards():
    cfg, *_ = make_gen()
    assert supports_fused(cfg, interpret=True)
    assert not supports_fused(cfg, interpret=False)  # hidden=32 not 128-aligned
    lstm = GeneratorConfig(**{**cfg.__dict__, "cell": "lstm"})
    assert supports_fused(lstm, interpret=True)  # LSTM kernels: round 3
    nar = GeneratorConfig(**{**cfg.__dict__, "autoregressive": False})
    assert not supports_fused(nar, interpret=True)


def test_shorter_than_time_block():
    """T < tb: the whole scan is ONE partial grid block (uneven trailing
    block degenerate case). Forward must equal the XLA scan exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from music2dance_tpu.models import Generator, GeneratorConfig, JointLayout
    from music2dance_tpu.ops.fused_generator import fused_apply

    gcfg = GeneratorConfig(
        layout=JointLayout(n_joints=4, joint_dim=2), feature_dim=6,
        noise_dim=4, enc_dim=8, enc_layers=1, hidden_dim=16, rnn_layers=1,
        head_hidden=8,
    )
    gen = Generator(gcfg)
    feats = jax.random.normal(jax.random.key(0), (2, 3, 6))  # T=3 < tb=4
    z = jax.random.normal(jax.random.key(1), (2, 4))
    params = gen.init(jax.random.key(2), feats, z)
    ref = gen.apply(params, feats, z)
    got = fused_apply(params, gcfg, feats, z, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_fused_forward_equals_xla_scan_onset_channel():
    """Round-5 structural lever: the fused path's compute_gi_static must
    apply the same onset-channel append as the flax AudioEncoder."""
    import dataclasses

    cfg, gen, params, feats, z = make_gen()
    cfg = dataclasses.replace(cfg, onset_channel=True)
    gen = Generator(cfg)
    params = gen.init(jax.random.key(2), feats, z)
    ref = gen.apply(params, feats, z)
    out = fused_apply(params, cfg, feats, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
