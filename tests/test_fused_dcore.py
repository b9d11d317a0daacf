"""Merged critic-phase core (ops/fused_dcore.py): the single 3B-row op
must reproduce the unmerged composition (fused critic scores + fused GP)
and, through the outer grad, pure-XLA second-order autodiff — scores, gp,
parameter gradients, and TBPTT carries. Interpret mode on CPU, f32."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import Discriminator, DiscriminatorConfig, JointLayout
from music2dance_tpu.ops.fused_critic import fused_critic_apply
from music2dance_tpu.ops.fused_dcore import fused_d_phase
from music2dance_tpu.ops.fused_gp import fused_gradient_penalty
from music2dance_tpu.train.losses import critic_loss

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
B, T, F = 3, 21, 13


def setup(layers=1, conditional=True, cell="gru"):
    cfg = DiscriminatorConfig(
        layout=LAYOUT, feature_dim=F, conditional=conditional,
        conv_dim=16, conv_layers=2, conv_kernel=3,
        hidden_dim=32, rnn_layers=layers, cell=cell,
    )
    disc = Discriminator(cfg)
    ks = jax.random.split(jax.random.key(0), 6)
    real = jax.random.normal(ks[0], (B, T, LAYOUT.pose_dim))
    fake = jax.random.normal(ks[1], (B, T, LAYOUT.pose_dim))
    feats = jax.random.normal(ks[2], (B, T, F)) if conditional else None
    alpha = jax.random.uniform(ks[3], (B, 1, 1))
    x_hat = alpha * real + (1 - alpha) * fake
    params = disc.init(ks[4], real, feats)
    return cfg, disc, params, real, fake, x_hat, feats


def d_loss_merged(params, cfg, real, fake, x_hat, feats):
    s_real, s_fake, gp = fused_d_phase(
        params, cfg, real, fake, x_hat, feats, interpret=True
    )
    return critic_loss(s_real, s_fake, gp, 10.0, 1e-3), (s_real, s_fake, gp)


def d_loss_unmerged(params, cfg, real, fake, x_hat, feats):
    x_rf = jnp.concatenate([real, fake], axis=0)
    f_rf = None if feats is None else jnp.concatenate([feats] * 2, axis=0)
    scores = fused_critic_apply(params, cfg, x_rf, f_rf, interpret=True)
    s_real, s_fake = scores[:B], scores[B:]
    gp = fused_gradient_penalty(params, cfg, x_hat, feats, interpret=True)
    return critic_loss(s_real, s_fake, gp, 10.0, 1e-3), (s_real, s_fake, gp)


def d_loss_xla(params, cfg, disc, real, fake, x_hat, feats):
    """Pure-XLA oracle: batched pass + selection-cotangent GP (the
    train/step.py XLA branch)."""
    x_all = jnp.concatenate([real, fake, x_hat], axis=0)
    f_all = None if feats is None else jnp.concatenate([feats] * 3, axis=0)
    scores, pullback = jax.vjp(lambda x: disc.apply(params, x, f_all), x_all)
    sel = jnp.concatenate(
        [jnp.zeros((2 * B,), scores.dtype), jnp.ones((B,), scores.dtype)]
    )
    (gx,) = pullback(sel)
    g_hat = gx[2 * B:]
    sq = jnp.sum(g_hat * g_hat, axis=tuple(range(1, g_hat.ndim)))
    gp = jnp.mean((jnp.sqrt(sq + 1e-12) - 1.0) ** 2)
    return critic_loss(scores[:B], scores[B:2 * B], gp, 10.0, 1e-3), (
        scores[:B], scores[B:2 * B], gp,
    )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
@pytest.mark.parametrize("conditional", [True, False])
def test_forward_matches_unmerged(layers, conditional, cell):
    cfg, _disc, params, real, fake, x_hat, feats = setup(layers, conditional,
                                                         cell=cell)
    (_, (sr_m, sf_m, gp_m)) = d_loss_merged(params, cfg, real, fake, x_hat, feats)
    (_, (sr_u, sf_u, gp_u)) = d_loss_unmerged(params, cfg, real, fake, x_hat, feats)
    np.testing.assert_allclose(np.asarray(sr_m), np.asarray(sr_u), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sf_m), np.asarray(sf_u), rtol=1e-6)
    np.testing.assert_allclose(float(gp_m), float(gp_u), rtol=1e-6)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
def test_grads_match_xla_second_order(layers, cell):
    """Parameter gradients of the full critic loss (incl. the GP's
    second-order term) through the merged op vs pure-XLA autodiff."""
    cfg, disc, params, real, fake, x_hat, feats = setup(layers, cell=cell)

    g_merged = jax.grad(
        lambda p: d_loss_merged(p, cfg, real, fake, x_hat, feats)[0]
    )(params)
    g_xla = jax.grad(
        lambda p: d_loss_xla(p, cfg, disc, real, fake, x_hat, feats)[0]
    )(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_xla),
        jax.tree_util.tree_leaves_with_path(g_merged),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=2e-5 * scale,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_tbptt_carries_match_unmerged(cell):
    """With nonzero incoming carries the merged op must return the same
    scores and final real/fake stream states as two separate fused
    critic passes (zero-carry GP unaffected)."""
    cfg, _disc, params, real, fake, x_hat, feats = setup(layers=2, cell=cell)
    k = jax.random.key(9)

    def mk_carry(scale):
        hs = jax.random.normal(k, (cfg.rnn_layers, B, cfg.hidden_dim)) * scale
        if cell == "gru":
            return hs
        cs = jax.random.normal(jax.random.fold_in(k, 1),
                               (cfg.rnn_layers, B, cfg.hidden_dim)) * scale
        return (hs, cs)

    c_real = mk_carry(0.3)
    c_fake = mk_carry(0.2)

    s_real, s_fake, gp, (fin_r, fin_f) = fused_d_phase(
        params, cfg, real, fake, x_hat, feats,
        carries=(c_real, c_fake), return_carries=True, interpret=True,
    )
    f_all = jnp.concatenate([feats] * 1, axis=0)
    sr_u, fin_r_u = fused_critic_apply(
        params, cfg, real, f_all, carry=c_real, return_carry=True, interpret=True
    )
    sf_u, fin_f_u = fused_critic_apply(
        params, cfg, fake, f_all, carry=c_fake, return_carry=True, interpret=True
    )
    gp_u = fused_gradient_penalty(params, cfg, x_hat, feats, interpret=True)
    np.testing.assert_allclose(np.asarray(s_real), np.asarray(sr_u), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_fake), np.asarray(sf_u), rtol=1e-6)
    np.testing.assert_allclose(float(gp), float(gp_u), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(fin_r), jax.tree.leaves(fin_r_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(fin_f), jax.tree.leaves(fin_f_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
