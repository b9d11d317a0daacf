"""Data-parallel equivalence on 8 virtual CPU devices (SURVEY.md §4.6).

The sharded step must equal the single-device step on the concatenated
batch — same losses, same updated parameters (within f32 reduction-order
tolerance). This is the JAX-idiomatic replacement for multi-node fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.parallel import make_mesh, shard_batch, shard_train_step
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_step_equals_single_device_step():
    tc = TrainConfig(batch_size=16)
    batch = synthetic_batch(
        jax.random.key(0), 16, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)

    # single-device reference
    ref_step = jax.jit(make_train_step(GAN, tc))
    ref_state, ref_metrics = ref_step(state, batch)

    # 8-way DP
    mesh = make_mesh(8)
    dp_step = shard_train_step(GAN, tc, mesh, donate=False)
    dp_state, dp_metrics = dp_step(state, shard_batch(batch, mesh))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(dp_metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=5e-5,
            err_msg=f"metric {k}",
        )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.g_params),
        jax.tree_util.tree_leaves_with_path(dp_state.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=3e-4,
            err_msg=f"g_param {jax.tree_util.keystr(pa)}",
        )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.d_params),
        jax.tree_util.tree_leaves_with_path(dp_state.d_params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=3e-4,
            err_msg=f"d_param {jax.tree_util.keystr(pa)}",
        )


def test_mesh_size_agnostic():
    """Same code on a 1-, 2- and 4-device mesh."""
    tc = TrainConfig(batch_size=8)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    losses = []
    for n in [1, 2, 4]:
        mesh = make_mesh(n)
        dp_step = shard_train_step(GAN, tc, mesh, donate=False)
        _, metrics = dp_step(state, shard_batch(batch, mesh))
        losses.append(float(metrics["d_loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4)
    np.testing.assert_allclose(losses[0], losses[2], rtol=2e-4)


def test_multi_step_on_mesh_stays_finite():
    tc = TrainConfig(batch_size=16, n_critic=2)
    mesh = make_mesh(8)
    batch = synthetic_batch(
        jax.random.key(0), 16, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    dp_step = shard_train_step(GAN, tc, mesh, donate=False)
    sb = shard_batch(batch, mesh)
    for _ in range(3):
        state, metrics = dp_step(state, sb)
    assert np.isfinite(float(metrics["d_loss"]))
    assert np.isfinite(float(metrics["g_loss"]))
    assert int(state.step) == 3
