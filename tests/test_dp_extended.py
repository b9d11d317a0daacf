"""DP coverage for TBPTT and batched decode (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.parallel import (
    make_mesh,
    shard_batch,
    shard_decode,
    shard_tbptt_train_step,
)
from music2dance_tpu.train import TrainConfig, init_state
from music2dance_tpu.train.tbptt import make_tbptt_train_step
from music2dance_tpu.infer.decode import decode_poses

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def test_sharded_tbptt_equals_single_device():
    tc = TrainConfig(batch_size=8, tbptt_window=5, n_critic=1)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    batch = {k: v[:, :10] for k, v in batch.items()}  # 2 windows
    state = init_state(jax.random.key(1), GAN, tc, batch)

    ref_state, ref_metrics = jax.jit(make_tbptt_train_step(GAN, tc))(state, batch)

    mesh = make_mesh(4)
    dp_step = shard_tbptt_train_step(GAN, tc, mesh, donate=False)
    dp_state, dp_metrics = dp_step(state, shard_batch(batch, mesh))

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(dp_metrics[k]), float(ref_metrics[k]), rtol=5e-4, atol=5e-5,
            err_msg=f"metric {k}",
        )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.g_params),
        jax.tree_util.tree_leaves_with_path(dp_state.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_sharded_decode_matches_shapes_and_masks():
    mesh = make_mesh(8)
    b, t = 16, 12
    batch = synthetic_batch(
        jax.random.key(0), 2, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, TrainConfig(batch_size=2), batch)

    feats = jax.random.normal(jax.random.key(2), (b, t, AUDIO.n_mfcc))
    lengths = jnp.arange(b) % t + 1
    dec = shard_decode(GAN, mesh)
    poses = dec(state.g_params, feats, jax.random.key(3), lengths)
    assert poses.shape == (b, t, LAYOUT.n_joints, LAYOUT.joint_dim)
    p = np.asarray(poses)
    for i in range(b):
        assert np.all(p[i, int(lengths[i]):] == 0.0)
        assert np.isfinite(p[i]).all()


def test_sharded_decode_differs_across_shards():
    """Latents must differ across shards (fold_in axis_index)."""
    mesh = make_mesh(4)
    b, t = 8, 6
    batch = synthetic_batch(
        jax.random.key(0), 2, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, TrainConfig(batch_size=2), batch)
    feats = jnp.tile(jax.random.normal(jax.random.key(2), (1, t, AUDIO.n_mfcc)), (b, 1, 1))
    dec = shard_decode(GAN, mesh)
    poses = np.asarray(
        dec(state.g_params, feats, jax.random.key(3), jnp.full((b,), t, jnp.int32))
    )
    # identical conditioning; songs on different shards must still differ
    assert not np.allclose(poses[0], poses[2])
