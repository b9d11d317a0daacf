"""Alternating WGAN-GP train step tests (SURVEY.md §4.3).

Tiny-GAN config [BASELINE config #2 scaled down in T for CI speed]: one
jitted alternating step — losses finite, gradient penalty positive, both
param trees change, and the G/D updates don't cross-contaminate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def make_batch(batch=8, seconds=0.5, key=0):
    return synthetic_batch(
        jax.random.key(key), batch, seconds, AUDIO, LAYOUT, through_frontend=False
    )


def leaves_allclose(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )


def test_one_step_finite_and_updates_both_trees():
    tc = TrainConfig(batch_size=8, lambda_gp=10.0, n_critic=1)
    batch = make_batch()
    state = init_state(jax.random.key(0), GAN, tc, batch)
    step = jax.jit(make_train_step(GAN, tc))
    new_state, metrics = step(state, batch)

    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite metric {k}"
    assert float(metrics["gp"]) > 0.0
    assert int(new_state.step) == 1
    assert not leaves_allclose(new_state.g_params, state.g_params)
    assert not leaves_allclose(new_state.d_params, state.d_params)


def test_no_cross_contamination():
    """lr_d=0 must freeze D exactly; lr_g=0 must freeze G exactly."""
    batch = make_batch()

    tc = TrainConfig(batch_size=8, lr_d=0.0)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    new_state, _ = jax.jit(make_train_step(GAN, tc))(state, batch)
    assert leaves_allclose(new_state.d_params, state.d_params)
    assert not leaves_allclose(new_state.g_params, state.g_params)

    tc = TrainConfig(batch_size=8, lr_g=0.0)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    new_state, _ = jax.jit(make_train_step(GAN, tc))(state, batch)
    assert leaves_allclose(new_state.g_params, state.g_params)
    assert not leaves_allclose(new_state.d_params, state.d_params)


def test_n_critic_multiple_updates():
    tc = TrainConfig(batch_size=8, n_critic=3)
    batch = make_batch()
    state = init_state(jax.random.key(0), GAN, tc, batch)
    new_state, metrics = jax.jit(make_train_step(GAN, tc))(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert not leaves_allclose(new_state.d_params, state.d_params)


def test_multi_step_losses_stay_finite():
    tc = TrainConfig(batch_size=8)
    batch = make_batch()
    state = init_state(jax.random.key(0), GAN, tc, batch)
    step = jax.jit(make_train_step(GAN, tc))
    for i in range(5):
        state, metrics = step(state, make_batch(key=i + 1))
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(state.step) == 5


def test_determinism():
    tc = TrainConfig(batch_size=8)
    batch = make_batch()
    step = jax.jit(make_train_step(GAN, tc))
    s1, m1 = step(init_state(jax.random.key(0), GAN, tc, batch), batch)
    s2, m2 = step(init_state(jax.random.key(0), GAN, tc, batch), batch)
    assert float(m1["d_loss"]) == float(m2["d_loss"])
    assert leaves_allclose(s1.g_params, s2.g_params)


def test_perf_preset_trains():
    """The TCN-critic performance preset: one step, finite, GP active."""
    import dataclasses

    from music2dance_tpu.models import GANConfig

    gan = GAN
    gan = GANConfig(
        generator=gan.generator,
        discriminator=dataclasses.replace(
            gan.discriminator, rnn_layers=0, conv_layers=3, conv_dilation=2
        ),
    )
    tc = TrainConfig(batch_size=8)
    batch = make_batch()
    state = init_state(jax.random.key(0), gan, tc, batch)
    new_state, metrics = jax.jit(make_train_step(gan, tc))(state, batch)
    assert np.isfinite(float(metrics["d_loss"]))
    assert float(metrics["gp"]) > 0.0
    assert not leaves_allclose(new_state.d_params, state.d_params)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fused_step_equals_xla_step(cell):
    """The fully-fused step (Pallas G kernels + fused critic + second-order
    GP op, interpret mode on CPU) must produce the same updates as the
    pure-XLA step: same RNG draws, same math, f32. Parametrized over both
    cell families (LSTM kernel bank: round 3)."""
    import dataclasses

    gan = GAN if cell == "gru" else type(GAN)(
        generator=dataclasses.replace(GAN.generator, cell=cell),
        discriminator=dataclasses.replace(GAN.discriminator, cell=cell),
    )
    tc = TrainConfig(batch_size=4, lambda_gp=10.0, n_critic=2)
    batch = make_batch(batch=4, seconds=0.4)
    state = init_state(jax.random.key(7), gan, tc, batch)

    step_xla = jax.jit(make_train_step(gan, tc, fused=False))
    step_fused = jax.jit(make_train_step(gan, tc, fused=True))

    sx, mx = step_xla(state, batch)
    sf, mf = step_fused(state, batch)
    for k in mx:
        np.testing.assert_allclose(
            float(mf[k]), float(mx[k]), rtol=5e-4, atol=1e-5, err_msg=k
        )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path((sx.g_params, sx.d_params)),
        jax.tree_util.tree_leaves_with_path((sf.g_params, sf.d_params)),
    ):
        a, b = np.asarray(a), np.asarray(b)
        # adam normalizes by grad scale; compare updated params directly
        np.testing.assert_allclose(
            b, a, rtol=2e-3, atol=2e-4, err_msg=jax.tree_util.keystr(pa)
        )

    # a second step from the fused state stays finite and in lockstep
    sx2, _ = step_xla(sx, batch)
    sf2, _ = step_fused(sf, batch)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sx2.d_params),
        jax.tree_util.tree_leaves_with_path(sf2.d_params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_ema_state_donatable():
    """init_state must not alias ema_g_params to g_params: the train
    loops jit the step with donate_argnums=(0,), and donating the same
    buffer twice is an XLA runtime error (hit via train.py --ema_decay
    on the stream loop, round 5). The EMA leaves must be fresh buffers
    and one donated step must execute."""
    tc = TrainConfig(batch_size=4, ema_decay=0.99)
    batch = make_batch(batch=4)
    state = init_state(jax.random.key(0), GAN, tc, batch)
    for g, e in zip(jax.tree_util.tree_leaves(state.g_params),
                    jax.tree_util.tree_leaves(state.ema_g_params)):
        assert g.unsafe_buffer_pointer() != e.unsafe_buffer_pointer()
        np.testing.assert_array_equal(np.asarray(g), np.asarray(e))
    step = jax.jit(make_train_step(GAN, tc), donate_argnums=(0,))
    state, metrics = step(state, batch)  # raised pre-fix
    assert int(state.step) == 1
    assert all(bool(jnp.isfinite(jnp.mean(v))) for v in metrics.values())
