"""Dual generator forward (ops/fused_gdual.py): per-row equality with the
per-phase fused calls, zero gradient flow through the forward-only branch,
and exact gradient equality with fused_apply_diff on the differentiable
branch. Interpret mode on CPU, f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import Generator, GeneratorConfig, JointLayout
from music2dance_tpu.ops.fused_gdual import fused_dual_apply, supports_dual
from music2dance_tpu.ops.fused_generator import fused_apply
from music2dance_tpu.ops.fused_generator_vjp import fused_apply_diff

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
B, T, F = 3, 17, 11


def setup(layers=2, cell="gru"):
    cfg = GeneratorConfig(
        layout=LAYOUT, feature_dim=F, noise_dim=6,
        enc_dim=12, enc_layers=1, hidden_dim=32, rnn_layers=layers,
        head_hidden=16, cell=cell,
    )
    gen = Generator(cfg)
    ks = jax.random.split(jax.random.key(0), 5)
    feats = jax.random.normal(ks[0], (B, T, F))
    zs = [jax.random.normal(ks[1 + i], (B, cfg.noise_dim)) for i in range(3)]
    params = gen.init(ks[4], feats, zs[0])
    return cfg, params, feats, zs


def test_supports_guard():
    cfg, *_ = setup()
    assert supports_dual(cfg, 8, interpret=True)
    assert supports_dual(cfg, 3, interpret=True)   # alignment waived
    assert not supports_dual(cfg, 3, interpret=False)  # 3 % 8 != 0


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("n_fwd", [1, 2])
def test_rows_match_per_phase_calls(n_fwd, cell):
    cfg, params, feats, zs = setup(cell=cell)
    fakes_fwd, fake_g = fused_dual_apply(
        params, cfg, feats, zs[:n_fwd], zs[n_fwd], interpret=True
    )
    assert len(fakes_fwd) == n_fwd
    for i in range(n_fwd):
        ref = fused_apply(params, cfg, feats, zs[i], interpret=True)
        np.testing.assert_allclose(
            np.asarray(fakes_fwd[i]), np.asarray(ref), rtol=1e-6, atol=1e-6
        )
    ref_g = fused_apply_diff(params, cfg, feats, zs[n_fwd], interpret=True)
    np.testing.assert_allclose(
        np.asarray(fake_g), np.asarray(ref_g), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_grads_match_single_diff_apply(cell):
    """d(loss(fake_g))/d(params) through the dual op == through
    fused_apply_diff; the forward-only branch contributes nothing."""
    cfg, params, feats, zs = setup(cell=cell)
    probe = jax.random.normal(jax.random.key(7), (B, T, LAYOUT.pose_dim))

    def loss_dual(p):
        fakes_fwd, fake_g = fused_dual_apply(
            p, cfg, feats, zs[:2], zs[2], interpret=True
        )
        # consume the fwd branch too — must NOT leak gradient
        return jnp.sum(jnp.tanh(fake_g * probe)) + 0.0 * jnp.sum(fakes_fwd[0])

    def loss_single(p):
        fake_g = fused_apply_diff(p, cfg, feats, zs[2], interpret=True)
        return jnp.sum(jnp.tanh(fake_g * probe))

    np.testing.assert_allclose(
        float(loss_dual(params)), float(loss_single(params)), rtol=1e-6
    )
    gd = jax.grad(loss_dual)(params)
    gs = jax.grad(loss_single)(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gs),
        jax.tree_util.tree_leaves_with_path(gd),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=1e-5, atol=1e-7 * scale,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_fwd_branch_stops_gradient():
    """A loss on the forward-only fakes alone yields exactly zero grads."""
    cfg, params, feats, zs = setup(layers=1)

    def loss(p):
        fakes_fwd, _ = fused_dual_apply(p, cfg, feats, zs[:1], zs[1], interpret=True)
        return jnp.sum(fakes_fwd[0] ** 2)

    g = jax.grad(loss)(params)
    assert all(float(jnp.abs(x).max()) == 0.0 for x in jax.tree.leaves(g))


def test_onset_channel_matches_flax_forward():
    """Round-5 structural lever: compute_gi_multi must append the onset
    channel exactly like the flax AudioEncoder / compute_gi_static — the
    cond_onset TPU run crashed on the 20-vs-21 conv channel mismatch when
    only fused_generator.py carried the append."""
    import dataclasses

    cfg, _, feats, zs = setup(layers=1)
    cfg = dataclasses.replace(cfg, onset_channel=True)
    gen = Generator(cfg)
    params = gen.init(jax.random.key(9), feats, zs[0])
    fakes_fwd, fake_g = fused_dual_apply(
        params, cfg, feats, zs[:1], zs[1], interpret=True
    )
    ref_fwd = gen.apply(params, feats, zs[0])
    ref_g = gen.apply(params, feats, zs[1])
    np.testing.assert_allclose(np.asarray(fakes_fwd[0]), np.asarray(ref_fwd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fake_g), np.asarray(ref_g),
                               rtol=1e-5, atol=1e-5)
