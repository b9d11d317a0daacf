"""Sequence-parallel (GSPMD context parallelism) equivalence on the 8
virtual CPU devices.

Sharding the TIME dimension never changes results — the SP step over a
(data x seq[ x model]) mesh must equal the single-device jit step up to
f32 reduction order. A clip whose frame count does not divide the seq
axis is rejected loudly (jit input shardings need exact divisibility;
padding would silently change the per-frame-score objective).
"""

import dataclasses

import jax
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.infer.decode import decode_poses
from music2dance_tpu.models import JointLayout, transformer_gan
from music2dance_tpu.parallel import make_mesh_3d, sp_decode, sp_train_step
from music2dance_tpu.parallel.sp import check_sp_family
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)


def _small_transformer_gan(critic: str = "transformer"):
    gan = transformer_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    gan = dataclasses.replace(
        gan,
        generator=dataclasses.replace(
            gan.generator, hidden_dim=64, head_hidden=32, tr_blocks=2,
            tr_heads=4, enc_dim=32, noise_dim=8,
        ),
        discriminator=dataclasses.replace(
            gan.discriminator, hidden_dim=64, tr_blocks=2, tr_heads=4,
            conv_dim=32,
        ),
    )
    if critic == "tcn":
        # the attn_long pairing: attention G + conv-only TCN critic
        gan = dataclasses.replace(
            gan,
            discriminator=dataclasses.replace(
                gan.discriminator, arch="rnn", rnn_layers=0, conv_layers=3,
                conv_dilation=2,
            ),
        )
    return gan


def _give_head_weight(state):
    """head_out is zero-init (training stability); at step 1 that makes
    every upstream G gradient a rounding residue. Give it weight so the
    comparison tests real gradients."""
    gp = jax.tree_util.tree_map(lambda x: x, state.g_params)
    ho = gp["params"]["head_out"]["kernel"]
    gp["params"]["head_out"]["kernel"] = (
        jax.random.normal(jax.random.key(9), ho.shape, ho.dtype) * 0.02
    )
    return state.replace(g_params=gp)


def _assert_state_close(a, b, rtol=2e-3, atol=5e-5):
    for (pa, x), (_, y) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        if x.dtype == jax.numpy.uint32:  # rng key data
            continue
        key = jax.tree_util.keystr(pa)
        if key.endswith("['bias']") and (
            "score" in key or "['k']" in key or "ln_f" in key
        ):
            # zero-true-gradient knife edges (see tests/test_tp.py)
            continue
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol, err_msg=key,
        )


@pytest.mark.parametrize(
    "critic,n_data,n_seq,n_model",
    [
        ("transformer", 2, 4, 1),   # pure data x context
        ("transformer", 2, 2, 2),   # data x context x tensor composed
        ("tcn", 2, 4, 1),           # the attn_long pairing (dilated convs
                                    # exercise halo exchange)
    ],
)
def test_sp_step_equals_single_device(critic, n_data, n_seq, n_model):
    gan = _small_transformer_gan(critic)
    tc = TrainConfig(batch_size=8)
    # 0.775 s at this audio config -> T = 32 frames (divides every axis)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.775, AUDIO, LAYOUT, through_frontend=False
    )
    assert batch["feats"].shape[1] % n_seq == 0
    state = _give_head_weight(init_state(jax.random.key(1), gan, tc, batch))

    ref_state, ref_metrics = jax.jit(make_train_step(gan, tc))(state, batch)

    mesh = make_mesh_3d(n_data, n_seq, n_model)
    sp_step, sp_state = sp_train_step(gan, tc, mesh, state, donate=False)
    sp_state, sp_metrics = sp_step(sp_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(sp_metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=5e-5,
            err_msg=f"metric {k}",
        )
    _assert_state_close(sp_state.g_params, ref_state.g_params)
    _assert_state_close(sp_state.d_params, ref_state.d_params)


def test_sp_decode_equals_single_device():
    gan = _small_transformer_gan()
    tc = TrainConfig(batch_size=8)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.775, AUDIO, LAYOUT, through_frontend=False
    )
    state = _give_head_weight(init_state(jax.random.key(1), gan, tc, batch))
    feats = batch["feats"]
    lengths = np.full((8,), feats.shape[1], np.int32)
    key = jax.random.key(7)

    ref = decode_poses(state.g_params, gan.generator, feats, key,
                       lengths=lengths, impl="xla")

    mesh = make_mesh_3d(2, 2, 2)
    fn, p_sh = sp_decode(gan, mesh, state.g_params)
    got = fn(p_sh, feats, key, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=5e-5)


def test_sp_rejects_indivisible_time():
    from music2dance_tpu.parallel.sp import check_sp_time

    check_sp_time(32, 4)
    with pytest.raises(ValueError, match="21 frames"):
        check_sp_time(21, 4)

    gan = _small_transformer_gan()
    tc = TrainConfig(batch_size=8)
    batch = synthetic_batch(   # T = 21: indivisible by 4
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), gan, tc, batch)
    mesh = make_mesh_3d(2, 4, 1)
    sp_step, sp_state = sp_train_step(gan, tc, mesh, state, donate=False)
    with pytest.raises(ValueError, match="does not divide the clip"):
        sp_step(sp_state, batch)


def test_sp_rejects_recurrent_family():
    from music2dance_tpu.models import tiny_gan

    gan = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    with pytest.raises(ValueError, match="parallel-over-time"):
        check_sp_family(gan)

    # attention G but recurrent critic: still rejected, names the critic
    tgan = _small_transformer_gan()
    bad = dataclasses.replace(
        tgan,
        discriminator=dataclasses.replace(
            tgan.discriminator, arch="rnn", rnn_layers=1
        ),
    )
    with pytest.raises(ValueError, match="recurrent critic"):
        check_sp_family(bad)
