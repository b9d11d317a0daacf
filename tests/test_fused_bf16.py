"""bf16 fused generator kernel: mixed precision (bf16 MXU operands, f32
accumulators/gates/carries) must track the f32 XLA scan within bf16
rounding, forward and backward (VERDICT round-1 item #2).

Tolerances: bf16 has an 8-bit mantissa (~0.4% relative); error compounds
through the T-step recurrence, so the gates here are ~2e-2 relative on the
pose trajectories and per-leaf-scaled on gradients. The f32 fused path
stays under its exact gates in test_fused_generator / test_fused_vjp.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import Generator, GeneratorConfig, JointLayout
from music2dance_tpu.ops.fused_generator import fused_apply, supports_fused
from music2dance_tpu.ops.fused_generator_vjp import fused_apply_diff

LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def make_pair(layers=2, residual=True, t=21, cell="gru"):
    """(bf16 cfg, f32 cfg) sharing one f32 param tree."""
    base = dict(
        layout=LAYOUT, feature_dim=13, noise_dim=8, enc_dim=16, enc_layers=2,
        enc_kernel=3, hidden_dim=32, rnn_layers=layers, cell=cell,
        head_hidden=16, residual_pose=residual,
    )
    cfg16 = GeneratorConfig(**base, dtype="bfloat16")
    cfg32 = GeneratorConfig(**base, dtype="float32")
    gen32 = Generator(cfg32)
    feats = jax.random.normal(jax.random.key(0), (3, t, 13))
    z = jax.random.normal(jax.random.key(1), (3, 8))
    params = gen32.init(jax.random.key(2), feats, z)
    return cfg16, cfg32, gen32, params, feats, z


def test_supports_fused_accepts_bf16():
    cfg16, *_ = make_pair()
    assert supports_fused(cfg16, interpret=True)
    fp8 = dataclasses.replace(cfg16, dtype="float8_e4m3")
    assert not supports_fused(fp8, interpret=True)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("residual", [True, False])
def test_bf16_forward_tracks_f32(residual, cell):
    cfg16, cfg32, gen32, params, feats, z = make_pair(residual=residual,
                                                      cell=cell)
    ref = np.asarray(gen32.apply(params, feats, z))
    out = np.asarray(fused_apply(params, cfg16, feats, z))
    assert out.dtype == np.float32  # poses stay f32
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out, ref, atol=2e-2 * scale)


def test_bf16_forward_with_carry_chains():
    cfg16, cfg32, gen32, params, feats, z = make_pair()
    full = np.asarray(fused_apply(params, cfg16, feats, z))
    first, carry = fused_apply(params, cfg16, feats[:, :12], z, return_carry=True)
    assert carry[0].dtype == jnp.float32 and carry[1].dtype == jnp.float32
    # chained halves must agree with the unchained bf16 run exactly: the
    # carry is f32 and the kernel is deterministic
    second = fused_apply(params, cfg16, feats[:, 12:], z, carry=carry)
    got = np.asarray(jnp.concatenate([first, second], axis=1))
    # encoder has kernel 3 (crosses the split) -> compare only away from it
    np.testing.assert_allclose(got[:, :10], full[:, :10], rtol=0, atol=1e-6)


def test_bf16_grads_track_f32():
    cfg16, cfg32, gen32, params, feats, z = make_pair()
    w = jax.random.normal(jax.random.key(3), (3, 21, cfg32.pose_dim))

    def loss32(p):
        return jnp.mean(gen32.apply(p, feats, z) * w)

    def loss16(p):
        return jnp.mean(fused_apply_diff(p, cfg16, feats, z) * w)

    ref = jax.grad(loss32)(params)
    out = jax.grad(loss16)(params)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref),
        jax.tree_util.tree_leaves_with_path(out),
    ):
        a, b = np.asarray(a), np.asarray(b)
        assert b.dtype == a.dtype, jax.tree_util.keystr(pa)
        # per-element: within 15% of the leaf's grad scale (bf16 rounding
        # compounds through encoder+scan depth on the upstream-most leaves)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(
            b, a, atol=1.5e-1 * scale, err_msg=jax.tree_util.keystr(pa)
        )
        # direction must agree: cosine similarity of flattened grads
        cos = np.dot(a.ravel(), b.ravel()) / (
            np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
        )
        assert cos > 0.99, f"{jax.tree_util.keystr(pa)}: cos={cos:.4f}"


def test_bf16_train_step_runs_and_is_finite():
    """Full alternating step on a bf16 GAN config (XLA critic; the fused
    path engages on TPU only — here it exercises the bf16 XLA G too)."""
    from music2dance_tpu.models import (
        DiscriminatorConfig, GANConfig,
    )
    from music2dance_tpu.train import TrainConfig, init_state, make_train_step

    cfg16, *_ = make_pair()
    gan = GANConfig(
        generator=cfg16,
        discriminator=DiscriminatorConfig(
            layout=LAYOUT, feature_dim=13, conv_dim=16, conv_layers=1,
            hidden_dim=32, rnn_layers=1, dtype="bfloat16",
        ),
    )
    tc = TrainConfig(batch_size=2, n_critic=1)
    batch = {
        "feats": jax.random.normal(jax.random.key(0), (2, 21, 13)),
        "poses": jax.random.normal(jax.random.key(1), (2, 21, LAYOUT.pose_dim)),
    }
    state = init_state(jax.random.key(2), gan, tc, batch)
    step = jax.jit(make_train_step(gan, tc))
    state, metrics = step(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
