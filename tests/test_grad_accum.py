"""Gradient accumulation: the accumulated step IS the big-batch step.

Every loss term is a per-example mean (train/losses.py) and the
per-example RNG keys derive from GLOBAL example indices, so computing
each update's gradients over K sequential microbatch slices and
averaging must reproduce the one-shot big-batch update at reduction
order — single-device AND under shard_map DP (where global index =
device stride + slice offset + lane).
"""

import dataclasses

import jax
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.parallel import make_mesh, shard_batch, shard_train_step
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def _setup(tc):
    batch = synthetic_batch(
        jax.random.key(0), tc.batch_size, 0.5, AUDIO, LAYOUT,
        through_frontend=False,
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    return state, batch


def _assert_state_close(a, b, rtol=5e-4, atol=1e-5):
    for (pa, x), (_, y) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        if x.dtype == jax.numpy.uint32:
            continue
        key = jax.tree_util.keystr(pa)
        if key.endswith("['bias']") and "score" in key:
            # zero-true-gradient knife edge (see tests/test_tp.py)
            continue
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol, err_msg=key,
        )


@pytest.mark.parametrize("accum", [2, 4])
def test_accum_equals_big_batch(accum):
    """K-slice accumulation == one-shot step, with every optional loss
    term on (n_critic>1, EMA, continuity, feature matching, clip)."""
    tc = TrainConfig(
        batch_size=8, n_critic=2, ema_decay=0.99, continuity_weight=0.1,
        feature_matching_weight=1.0, grad_clip_norm=1.0,
    )
    state, batch = _setup(tc)

    ref_step = jax.jit(make_train_step(GAN, tc))
    ref_state, ref_metrics = ref_step(state, batch)
    ref_state, ref_metrics = ref_step(ref_state, batch)

    tc_a = dataclasses.replace(tc, grad_accum=accum)
    acc_step = jax.jit(make_train_step(GAN, tc_a))
    acc_state, acc_metrics = acc_step(state, batch)
    acc_state, acc_metrics = acc_step(acc_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(acc_metrics[k]), float(ref_metrics[k]), rtol=5e-4,
            atol=1e-5, err_msg=f"metric {k}",
        )
    _assert_state_close(acc_state.g_params, ref_state.g_params)
    _assert_state_close(acc_state.d_params, ref_state.d_params)
    _assert_state_close(acc_state.ema_g_params, ref_state.ema_g_params)


def test_accum_under_dp_equals_single_device():
    """DP x accumulation: 4 devices x K=2 slices of a global batch of 8
    == the single-device one-shot step on the same batch."""
    tc = TrainConfig(batch_size=8)
    state, batch = _setup(tc)

    ref_state, ref_metrics = jax.jit(make_train_step(GAN, tc))(state, batch)

    tc_a = dataclasses.replace(tc, grad_accum=2)
    mesh = make_mesh(4)
    step = shard_train_step(GAN, tc_a, mesh, donate=False)
    dp_state, dp_metrics = step(state, shard_batch(batch, mesh))

    for k in ref_metrics:
        # atol 5e-4: g_loss sees the critic score-bias knife edge (zero
        # true gradient -> Adam emits an O(lr) shift from rounding
        # residue, and that bias shifts every score additively)
        np.testing.assert_allclose(
            float(np.mean(dp_metrics[k])), float(ref_metrics[k]), rtol=2e-3,
            atol=5e-4, err_msg=f"metric {k}",
        )
    _assert_state_close(dp_state.g_params, ref_state.g_params)
    _assert_state_close(dp_state.d_params, ref_state.d_params)


def test_accum_divisibility_is_loud():
    tc = TrainConfig(batch_size=6, grad_accum=4)
    state, batch = _setup(tc)
    with pytest.raises(ValueError, match="does not divide"):
        jax.jit(make_train_step(GAN, tc))(state, batch)


def test_accum_rejects_tbptt():
    from music2dance_tpu.train.tbptt import make_tbptt_machinery

    tc = TrainConfig(batch_size=8, tbptt_window=4, grad_accum=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_tbptt_machinery(GAN, tc)
