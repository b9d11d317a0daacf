"""Custom-VJP fused generator: gradients must match XLA autodiff exactly
(interpret mode on CPU; compiled path exercised on TPU by run_perf)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def assert_grads_close(ref, out):
    """f32 matmul reduction order differs between the two implementations;
    compare with tolerance relative to each leaf's gradient scale."""
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref),
        jax.tree_util.tree_leaves_with_path(out),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=1e-4 * scale,
            err_msg=jax.tree_util.keystr(pa),
        )

from music2dance_tpu.models import Generator, GeneratorConfig, JointLayout
from music2dance_tpu.ops.fused_generator_vjp import fused_apply_diff

LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def setup(layers=2, residual=True, t=21, cell="gru"):
    cfg = GeneratorConfig(
        layout=LAYOUT, feature_dim=13, noise_dim=8, enc_dim=16, enc_layers=2,
        enc_kernel=3, hidden_dim=32, rnn_layers=layers, cell=cell,
        head_hidden=16, residual_pose=residual,
    )
    gen = Generator(cfg)
    feats = jax.random.normal(jax.random.key(0), (3, t, 13))
    z = jax.random.normal(jax.random.key(1), (3, 8))
    params = gen.init(jax.random.key(2), feats, z)
    return cfg, gen, params, feats, z


def loss_weights(key, shape):
    return jax.random.normal(key, shape)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
@pytest.mark.parametrize("residual", [True, False])
def test_grads_match_xla(layers, residual, cell):
    cfg, gen, params, feats, z = setup(layers=layers, residual=residual,
                                       cell=cell)
    w = loss_weights(jax.random.key(3), (3, 21, cfg.pose_dim))

    def loss_xla(p, f, zz):
        return jnp.sum(gen.apply(p, f, zz) * w)

    def loss_fused(p, f, zz):
        return jnp.sum(fused_apply_diff(p, cfg, f, zz) * w)

    (ref_val, ref_grads) = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(params, feats, z)
    (out_val, out_grads) = jax.value_and_grad(loss_fused, argnums=(0, 1, 2))(params, feats, z)

    np.testing.assert_allclose(float(out_val), float(ref_val), rtol=1e-5)
    assert_grads_close(ref_grads, out_grads)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_grads_with_carry_cotangents(cell):
    """TBPTT shape: loss also reads the final carry."""
    cfg, gen, params, feats, z = setup(cell=cell)

    def carry_sq(h_fin):
        return sum(jnp.sum(x**2) for x in jax.tree.leaves(h_fin))

    def loss_xla(p):
        poses, (h_fin, p_fin) = gen.apply(p, feats, z, return_carry=True)
        return jnp.sum(poses**2) + carry_sq(h_fin) + jnp.sum(p_fin**2)

    def loss_fused(p):
        poses, (h_fin, p_fin) = fused_apply_diff(p, cfg, feats, z, return_carry=True)
        return jnp.sum(poses**2) + carry_sq(h_fin) + jnp.sum(p_fin**2)

    ref = jax.grad(loss_xla)(params)
    out = jax.grad(loss_fused)(params)
    assert_grads_close(ref, out)


def test_grads_through_gan_objective():
    """End-to-end g_loss shape: -mean(D(G(feats, z)))-like reduction."""
    cfg, gen, params, feats, z = setup()
    probe = loss_weights(jax.random.key(5), (cfg.pose_dim,))

    def g_loss(apply_fn):
        def f(p):
            poses = apply_fn(p)
            score = jnp.tanh(poses @ probe).mean()
            return -score
        return f

    ref = jax.grad(g_loss(lambda p: gen.apply(p, feats, z)))(params)
    out = jax.grad(g_loss(lambda p: fused_apply_diff(p, cfg, feats, z)))(params)
    assert_grads_close(ref, out)
