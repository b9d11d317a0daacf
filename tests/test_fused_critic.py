"""Fused critic scan (ops/fused_critic.py): forward and first-order
gradient equivalence vs the flax Discriminator (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import Discriminator, DiscriminatorConfig, JointLayout
from music2dance_tpu.ops.fused_critic import (
    fused_critic_apply,
    supports_fused_critic,
)

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
B, T, F = 3, 21, 13


def make_disc(layers=1, conditional=True, dilation=1, cell="gru"):
    cfg = DiscriminatorConfig(
        layout=LAYOUT, feature_dim=F, conditional=conditional,
        conv_dim=16, conv_layers=2, conv_kernel=3, conv_dilation=dilation,
        hidden_dim=32, rnn_layers=layers, cell=cell,
    )
    disc = Discriminator(cfg)
    poses = jax.random.normal(jax.random.key(0), (B, T, LAYOUT.pose_dim))
    feats = jax.random.normal(jax.random.key(1), (B, T, F))
    params = disc.init(jax.random.key(2), poses, feats if conditional else None)
    return cfg, disc, params, poses, feats


def test_supports_guards():
    cfg, *_ = make_disc()
    assert supports_fused_critic(cfg, interpret=True)
    assert not supports_fused_critic(cfg, interpret=False)  # hidden 32
    tcn = DiscriminatorConfig(**{**cfg.__dict__, "rnn_layers": 0})
    assert not supports_fused_critic(tcn, interpret=True)
    lstm = DiscriminatorConfig(**{**cfg.__dict__, "cell": "lstm"})
    assert supports_fused_critic(lstm, interpret=True)  # LSTM kernels: round 3


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
@pytest.mark.parametrize("conditional", [True, False])
def test_forward_equivalence(layers, conditional, cell):
    cfg, disc, params, poses, feats = make_disc(layers, conditional, cell=cell)
    f = feats if conditional else None
    ref = np.asarray(disc.apply(params, poses, f))
    out = np.asarray(fused_critic_apply(params, cfg, poses, f))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_forward_with_dilation_and_carry():
    cfg, disc, params, poses, feats = make_disc(dilation=2)
    ref, ref_carry = disc.apply(params, poses, feats, return_carry=True)
    out, carry = fused_critic_apply(params, cfg, poses, feats, return_carry=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(carry), np.asarray(ref_carry),
                               rtol=1e-5, atol=1e-6)
    # chained halves == full (state carried across windows, TBPTT shape)
    s1, c1 = fused_critic_apply(params, cfg, poses[:, :12], feats[:, :12],
                                return_carry=True)
    s2 = fused_critic_apply(params, cfg, poses[:, 12:], feats[:, 12:], carry=c1)
    r1, rc1 = disc.apply(params, poses[:, :12], feats[:, :12], return_carry=True)
    r2 = disc.apply(params, poses[:, 12:], feats[:, 12:], carry=rc1)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
def test_grads_match_xla(layers, cell):
    """First-order grads wrt params AND poses (the custom VJP path)."""
    cfg, disc, params, poses, feats = make_disc(layers, cell=cell)
    w = jax.random.normal(jax.random.key(3), (B,))

    def loss_ref(p, x):
        return jnp.sum(disc.apply(p, x, feats) * w)

    def loss_fused(p, x):
        return jnp.sum(fused_critic_apply(p, cfg, x, feats) * w)

    rv, rg = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, poses)
    ov, og = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, poses)
    np.testing.assert_allclose(float(ov), float(rv), rtol=1e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(rg),
        jax.tree_util.tree_leaves_with_path(og),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-5 * scale,
                                   err_msg=jax.tree_util.keystr(pa))


def test_grads_with_carry_cotangent():
    """TBPTT shape: loss reads the final carry too."""
    cfg, disc, params, poses, feats = make_disc()

    def loss(apply_fn):
        def f(p):
            s, carry = apply_fn(p)
            return jnp.sum(s**2) + jnp.sum(carry**2)
        return f

    ref = jax.grad(loss(lambda p: disc.apply(p, poses, feats, return_carry=True)))(params)
    out = jax.grad(loss(lambda p: fused_critic_apply(p, cfg, poses, feats,
                                                     return_carry=True)))(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref),
        jax.tree_util.tree_leaves_with_path(out),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=1e-5 * scale,
                                   err_msg=jax.tree_util.keystr(pa))
