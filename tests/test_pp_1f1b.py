"""Lockstep-1F1B pipeline schedule (parallel/pp_1f1b.py).

The schedule moves WHERE and WHEN each chunk runs — never what it
computes — so the bar is exact equivalence: the 1F1B step must match
the single-device step AND the GPipe step to f32 reduction order, on
zero-init and mid-run (Adam-moment-carrying) states, with and without
the generator aux losses riding the per-microbatch loss turn-around.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, transformer_gan
from music2dance_tpu.parallel.pp import (
    make_mesh_pp,
    pp_export_params,
    pp_train_step,
)
from music2dance_tpu.parallel.pp_1f1b import (
    make_pp_1f1b_g_vag,
    pp_train_step_1f1b,
)
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256,
                    hop_length=200, n_mels=40, n_mfcc=13)


def _gan(tr_blocks=4, **gen_over):
    gan = transformer_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    return dataclasses.replace(
        gan,
        generator=dataclasses.replace(
            gan.generator, hidden_dim=64, head_hidden=32,
            tr_blocks=tr_blocks, tr_heads=4, enc_dim=32, noise_dim=8,
            **gen_over,
        ),
        discriminator=dataclasses.replace(
            gan.discriminator, hidden_dim=64, tr_blocks=2, tr_heads=4,
            conv_dim=32,
        ),
    )


def _batch(b, t):
    batch = synthetic_batch(jax.random.key(3), b, t / 30.0, AUDIO, LAYOUT,
                            through_frontend=False)
    return {k: v[:, :t] for k, v in batch.items()}


def _assert_trees_close(a, b, rtol, atol):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        key = jax.tree_util.keystr(path)
        if key.endswith("['bias']") and (
            "score" in key or "['k']" in key or "ln_f" in key
        ):
            # zero-true-gradient knife edges (tests/test_tp.py
            # _assert_state_close): Adam updates there are rounding
            # residue, not signal
            continue
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(fb[path]), rtol=rtol, atol=atol,
            err_msg=key,
        )


@pytest.mark.parametrize("n_stage,n_micro", [(2, 2), (4, 2), (2, 4)])
def test_1f1b_train_step_matches_single_device(n_stage, n_micro):
    gan = _gan()
    b, t = 8, 12
    batch = _batch(b, t)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4, ema_decay=0.99)
    state = init_state(jax.random.key(4), gan, tc, batch)

    ref_step = jax.jit(make_train_step(gan, tc, fused=False))
    r1, ref_metrics = ref_step(state, batch)
    r2, _ = ref_step(r1, batch)

    mesh = make_mesh_pp(2, n_stage)  # b_local = 4 per data shard
    step, pst = pp_train_step_1f1b(gan, tc, mesh, state,
                                   n_micro=n_micro, donate=False)
    pst, m = step(pst, batch)
    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]), float(m[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    _assert_trees_close(r1.g_params, pp_export_params(pst.g_params),
                        rtol=5e-4, atol=5e-5)
    _assert_trees_close(r1.ema_g_params, pp_export_params(pst.ema_g_params),
                        rtol=5e-4, atol=5e-5)

    # second step from the updated state: residual-buffer rotation and
    # Adam moments both carry across steps
    pst, _ = step(pst, batch)
    _assert_trees_close(r2.g_params, pp_export_params(pst.g_params),
                        rtol=5e-4, atol=5e-5)
    _assert_trees_close(r2.d_params, pst.d_params, rtol=5e-4, atol=5e-5)


def test_1f1b_matches_gpipe_step():
    """The two schedules are the same math in a different order — they
    must agree with each other at least as tightly as either agrees
    with the single-device step."""
    gan = _gan()
    b, t = 8, 12
    batch = _batch(b, t)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4)
    state = init_state(jax.random.key(4), gan, tc, batch)
    mesh = make_mesh_pp(2, 4)

    s_gp, st_gp = pp_train_step(gan, tc, mesh, state, n_micro=2,
                                donate=False)
    s_1f, st_1f = pp_train_step_1f1b(gan, tc, mesh, state, n_micro=2,
                                     donate=False)
    st_gp, m_gp = s_gp(st_gp, batch)
    st_1f, m_1f = s_1f(st_1f, batch)
    for k in m_gp:
        np.testing.assert_allclose(float(m_gp[k]), float(m_1f[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    _assert_trees_close(st_gp.g_params, st_1f.g_params,
                        rtol=2e-4, atol=2e-5)
    _assert_trees_close(st_gp.d_params, st_1f.d_params,
                        rtol=2e-4, atol=2e-5)


def test_1f1b_with_generator_aux_losses():
    """feature-matching + beat + continuity terms ride the
    per-microbatch loss turn-around at the last stage; their metric
    values and their gradients must both match the single-device step."""
    gan = _gan()
    b, t = 8, 12
    batch = _batch(b, t)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4,
                     feature_matching_weight=2.0, beat_loss_weight=0.5,
                     continuity_weight=0.1)
    state = init_state(jax.random.key(4), gan, tc, batch)

    ref_step = jax.jit(make_train_step(gan, tc, fused=False))
    r1, ref_metrics = ref_step(state, batch)
    assert "fm" in ref_metrics and "beat_loss" in ref_metrics

    mesh = make_mesh_pp(2, 2)
    step, pst = pp_train_step_1f1b(gan, tc, mesh, state, n_micro=4,
                                   donate=False)
    pst, m = step(pst, batch)
    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]), float(m[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    _assert_trees_close(r1.g_params, pp_export_params(pst.g_params),
                        rtol=5e-4, atol=5e-5)


def test_1f1b_n_critic_2_matches():
    """n_critic > 1: the critic phases ride GPipe's forward-only
    schedule, the generator phase the 1F1B interleave — the composed
    alternating step still matches single device."""
    gan = _gan()
    b, t = 8, 12
    batch = _batch(b, t)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4, n_critic=2)
    state = init_state(jax.random.key(4), gan, tc, batch)

    ref_step = jax.jit(make_train_step(gan, tc, fused=False))
    r1, _ = ref_step(state, batch)

    mesh = make_mesh_pp(2, 2)
    step, pst = pp_train_step_1f1b(gan, tc, mesh, state, n_micro=2,
                                   donate=False)
    pst, _ = step(pst, batch)
    _assert_trees_close(r1.g_params, pp_export_params(pst.g_params),
                        rtol=5e-4, atol=5e-5)
    _assert_trees_close(r1.d_params, pst.d_params, rtol=5e-4, atol=5e-5)


def test_1f1b_moe_gated_loudly():
    gan = _gan(moe_experts=4, moe_topk=2)
    mesh = make_mesh_pp(2, 2)
    tc = TrainConfig(batch_size=8, clip_seconds=0.4)
    with pytest.raises(ValueError, match="Switch aux"):
        make_pp_1f1b_g_vag(gan, tc, mesh, n_micro=2)


def test_1f1b_grad_accum_gated_loudly():
    gan = _gan()
    batch = _batch(8, 12)
    tc = TrainConfig(batch_size=8, clip_seconds=0.4, grad_accum=2)
    state = init_state(jax.random.key(4), gan, tc, batch)
    mesh = make_mesh_pp(2, 2)
    with pytest.raises(ValueError, match="microbatch"):
        pp_train_step_1f1b(gan, tc, mesh, state, n_micro=2)
