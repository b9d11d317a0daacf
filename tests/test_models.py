"""Model unit tests: shapes, scan/carry semantics, determinism (SURVEY.md §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import (
    Discriminator,
    Generator,
    GeneratorConfig,
    DiscriminatorConfig,
    JointLayout,
    tiny_gan,
    full_gan,
)

B, T, F = 4, 12, 20
LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def make_inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    feats = jax.random.normal(k1, (B, T, F))
    z = jax.random.normal(k2, (B, 8))
    poses = jax.random.normal(k3, (B, T, LAYOUT.pose_dim))
    return feats, z, poses


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_generator_shapes(cell):
    cfg = GeneratorConfig(
        layout=LAYOUT, feature_dim=F, noise_dim=8, enc_dim=16, enc_layers=1,
        hidden_dim=32, rnn_layers=2, cell=cell, head_hidden=16,
    )
    gen = Generator(cfg)
    feats, z, _ = make_inputs(jax.random.key(0))
    params = gen.init(jax.random.key(1), feats, z)
    poses = gen.apply(params, feats, z)
    assert poses.shape == (B, T, LAYOUT.pose_dim)
    assert poses.dtype == jnp.float32
    assert np.isfinite(np.asarray(poses)).all()


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_discriminator_shapes(cell):
    cfg = DiscriminatorConfig(
        layout=LAYOUT, feature_dim=F, conv_dim=16, conv_layers=1,
        hidden_dim=32, rnn_layers=1, cell=cell,
    )
    disc = Discriminator(cfg)
    feats, _, poses = make_inputs(jax.random.key(0))
    params = disc.init(jax.random.key(1), poses, feats)
    score = disc.apply(params, poses, feats)
    assert score.shape == (B,)
    assert np.isfinite(np.asarray(score)).all()


def test_unconditional_discriminator():
    cfg = DiscriminatorConfig(
        layout=LAYOUT, feature_dim=0, conditional=False, conv_dim=16,
        conv_layers=1, hidden_dim=32,
    )
    disc = Discriminator(cfg)
    _, _, poses = make_inputs(jax.random.key(0))
    params = disc.init(jax.random.key(1), poses)
    assert disc.apply(params, poses).shape == (B,)


def test_generator_deterministic_given_key():
    cfg = tiny_gan(feature_dim=F, layout=LAYOUT).generator
    gen = Generator(cfg)
    feats, z, _ = make_inputs(jax.random.key(0))
    params = gen.init(jax.random.key(1), feats, z)
    p1 = gen.apply(params, feats, z)
    p2 = gen.apply(params, feats, z)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_generator_carry_split_equivalence(cell):
    """Forward over T == forward over [0,T/2) then [T/2,T) with carry.

    This is the invariant truncated BPTT relies on (SURVEY.md §4.5): the
    windowed forward pass must match the full-sequence forward pass.
    """
    cfg = GeneratorConfig(
        layout=LAYOUT, feature_dim=F, noise_dim=8, enc_dim=16, enc_layers=1,
        enc_kernel=1,  # kernel 1: conv has no cross-window leakage
        hidden_dim=32, rnn_layers=2, cell=cell, head_hidden=16,
    )
    gen = Generator(cfg)
    feats, z, _ = make_inputs(jax.random.key(0))
    params = gen.init(jax.random.key(1), feats, z)

    full = gen.apply(params, feats, z)
    h = T // 2
    first, carry = gen.apply(params, feats[:, :h], z, return_carry=True)
    second = gen.apply(params, feats[:, h:], z, carry=carry)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([first, second], axis=1)),
        np.asarray(full), rtol=1e-5, atol=1e-5,
    )


def test_discriminator_carry_split_equivalence():
    cfg = DiscriminatorConfig(
        layout=LAYOUT, feature_dim=F, conv_dim=16, conv_layers=1,
        conv_kernel=1, hidden_dim=32, rnn_layers=1,
    )
    disc = Discriminator(cfg)
    feats, _, poses = make_inputs(jax.random.key(0))
    params = disc.init(jax.random.key(1), poses, feats)

    full = disc.apply(params, poses, feats)
    h = T // 2
    s1, carry = disc.apply(params, poses[:, :h], feats[:, :h], return_carry=True)
    s2 = disc.apply(params, poses[:, h:], feats[:, h:], carry=carry)
    # mean over time = length-weighted mean of the two halves
    np.testing.assert_allclose(
        np.asarray((s1 + s2) / 2.0), np.asarray(full), rtol=1e-5, atol=1e-5
    )


def test_scan_equals_unrolled_python_loop():
    """One fused scan ≡ stepping the generator one frame at a time."""
    cfg = tiny_gan(feature_dim=F, layout=LAYOUT).generator
    cfg = GeneratorConfig(**{**cfg.__dict__, "enc_kernel": 1})
    gen = Generator(cfg)
    feats, z, _ = make_inputs(jax.random.key(0))
    params = gen.init(jax.random.key(1), feats, z)

    full = gen.apply(params, feats, z)
    carry = None
    outs = []
    for t in range(T):
        step_out, carry = gen.apply(
            params, feats[:, t : t + 1], z, carry=carry, return_carry=True
        )
        outs.append(step_out)
    unrolled = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(unrolled), np.asarray(full), rtol=1e-5, atol=1e-5)


def test_teacher_forcing_changes_output_and_shapes():
    cfg = tiny_gan(feature_dim=F, layout=LAYOUT).generator
    gen = Generator(cfg)
    feats, z, poses = make_inputs(jax.random.key(0))
    params = gen.init(jax.random.key(1), feats, z)
    tf_prev = jnp.concatenate([jnp.zeros_like(poses[:, :1]), poses[:, :-1]], axis=1)
    out_tf = gen.apply(params, feats, z, tf_poses=tf_prev)
    out_ar = gen.apply(params, feats, z)
    assert out_tf.shape == out_ar.shape
    assert not np.allclose(np.asarray(out_tf), np.asarray(out_ar))


def test_noise_matters():
    cfg = tiny_gan(feature_dim=F, layout=LAYOUT).generator
    gen = Generator(cfg)
    feats, z, _ = make_inputs(jax.random.key(0))
    params = gen.init(jax.random.key(1), feats, z)
    out1 = gen.apply(params, feats, z)
    out2 = gen.apply(params, feats, z + 1.0)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_full_config_builds():
    cfg = full_gan(feature_dim=F, layout=LAYOUT)
    gen, disc = Generator(cfg.generator), Discriminator(cfg.discriminator)
    feats = jnp.zeros((2, 8, F))
    z = jnp.zeros((2, cfg.generator.noise_dim))
    gp = gen.init(jax.random.key(0), feats, z)
    poses = gen.apply(gp, feats, z)
    dp = disc.init(jax.random.key(1), poses, feats)
    assert disc.apply(dp, poses, feats).shape == (2,)


def test_tcn_critic():
    """rnn_layers=0 selects the scan-free conv-only critic."""
    cfg = DiscriminatorConfig(
        layout=LAYOUT, feature_dim=F, conv_dim=16, conv_layers=3,
        conv_dilation=2, hidden_dim=32, rnn_layers=0,
    )
    disc = Discriminator(cfg)
    feats, _, poses = make_inputs(jax.random.key(0))
    params = disc.init(jax.random.key(1), poses, feats)
    score = disc.apply(params, poses, feats)
    assert score.shape == (B,)
    assert np.isfinite(np.asarray(score)).all()
    # no scan params in the tree
    assert "step" not in params["params"]
    # gradient penalty second-order works through the conv critic
    from music2dance_tpu.train.losses import gradient_penalty

    gp_grad = jax.grad(
        lambda p: gradient_penalty(
            lambda x: disc.apply(p, x, feats), poses, poses * 0.5,
            alpha=jnp.full((B,), 0.3),
        )
    )(params)
    for leaf in jax.tree.leaves(gp_grad):
        assert np.isfinite(np.asarray(leaf)).all()
