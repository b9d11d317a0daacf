"""TBPTT tests (SURVEY.md §4.5).

The key equivalence: the fused lax.scan-over-windows step must equal a
python loop of per-window updates over CONCRETE carries. In the python
loop, gradients physically cannot flow between windows (the carries are
materialized arrays), so equality proves the scan truncates gradients at
window boundaries exactly.
"""

import jax
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.train import TrainConfig, init_state
from music2dance_tpu.train.tbptt import init_carries, make_tbptt_machinery

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
B, T, W = 4, 24, 6  # 4 windows


def make_long_batch(key=0):
    batch = synthetic_batch(
        jax.random.key(key), B, 1.0, AUDIO, LAYOUT, through_frontend=False
    )
    return {"feats": batch["feats"][:, :T], "poses": batch["poses"][:, :T]}


def test_scan_equals_python_loop_of_window_updates():
    tc = TrainConfig(batch_size=B, tbptt_window=W, n_critic=1)
    batch = make_long_batch()
    state = init_state(jax.random.key(1), GAN, tc, batch)
    window_update, train_step = make_tbptt_machinery(GAN, tc)

    # fused scan
    scan_state, scan_metrics = jax.jit(train_step)(state, batch)

    # python loop over concrete carries — gradients cannot cross windows
    next_rng, base = jax.random.split(jax.random.fold_in(state.rng, state.step))
    loop_state, carries = state, init_carries(GAN, B)
    wu = jax.jit(window_update)
    for widx in range(T // W):
        wf = batch["feats"][:, widx * W : (widx + 1) * W]
        wp = batch["poses"][:, widx * W : (widx + 1) * W]
        key = jax.random.fold_in(base, widx)
        loop_state, carries, _ = wu(loop_state, carries, wf, wp, key)

    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(scan_state.g_params),
        jax.tree_util.tree_leaves_with_path(loop_state.g_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"g {jax.tree_util.keystr(pa)}",
        )
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(scan_state.d_params),
        jax.tree_util.tree_leaves_with_path(loop_state.d_params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=f"d {jax.tree_util.keystr(pa)}",
        )


def test_tbptt_step_finite_and_updates():
    tc = TrainConfig(batch_size=B, tbptt_window=W)
    batch = make_long_batch()
    state = init_state(jax.random.key(1), GAN, tc, batch)
    _, train_step = make_tbptt_machinery(GAN, tc)
    new_state, metrics = jax.jit(train_step)(state, batch)

    for k, v in metrics.items():
        assert np.isfinite(np.asarray(v)).all(), k
    assert int(new_state.step) == 1
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(state.g_params), jax.tree.leaves(new_state.g_params)
        )
    )
    assert changed


def test_tbptt_rejects_bad_config():
    import pytest

    tc = TrainConfig(batch_size=B, tbptt_window=0)
    with pytest.raises(ValueError):
        make_tbptt_machinery(GAN, tc)

    tc = TrainConfig(batch_size=B, tbptt_window=7)  # 24 % 7 != 0
    _, train_step = make_tbptt_machinery(GAN, tc)
    batch = make_long_batch()
    state = init_state(jax.random.key(1), GAN, tc, batch)
    with pytest.raises(ValueError):
        jax.jit(train_step)(state, batch)


def test_tbptt_n_critic_and_remat():
    """n_critic > 1 (round-1 VERDICT weak #6) and the per-window remat
    flag produce finite training that matches the unremat-ed step."""
    tc = TrainConfig(batch_size=B, tbptt_window=W, n_critic=3)
    batch = make_long_batch()
    state = init_state(jax.random.key(2), GAN, tc, batch)
    _, train_step = make_tbptt_machinery(GAN, tc)
    s1, m1 = jax.jit(train_step)(state, batch)
    for k, v in m1.items():
        assert np.isfinite(float(v)), k

    import dataclasses
    tc_r = dataclasses.replace(tc, tbptt_remat=True)
    _, step_r = make_tbptt_machinery(GAN, tc_r)
    s2, m2 = jax.jit(step_r)(state, batch)
    # remat changes memory, not math
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.d_params),
        jax.tree_util.tree_leaves_with_path(s2.d_params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_tbptt_fused_equals_xla(cell):
    """Fused-kernel TBPTT step (interpret mode) == pure-XLA TBPTT step."""
    import dataclasses

    gan = GAN if cell == "gru" else type(GAN)(
        generator=dataclasses.replace(GAN.generator, cell=cell),
        discriminator=dataclasses.replace(GAN.discriminator, cell=cell),
    )
    tc = TrainConfig(batch_size=B, tbptt_window=W, n_critic=1)
    batch = make_long_batch()
    state = init_state(jax.random.key(3), gan, tc, batch)
    _, step_xla = make_tbptt_machinery(gan, tc, fused=False)
    _, step_fused = make_tbptt_machinery(gan, tc, fused=True)
    sx, mx = jax.jit(step_xla)(state, batch)
    sf, mf = jax.jit(step_fused)(state, batch)
    # metrics are means over 4 windows, each downstream of both adam
    # updates of every earlier window — f32 reduction-order differences
    # (the merged d-core sums weight grads as rf+hat where XLA's autodiff
    # accumulates in graph order) compound across windows, so this
    # cross-implementation check is looser than single-step ones
    for k in mx:
        np.testing.assert_allclose(float(mf[k]), float(mx[k]), rtol=8e-3,
                                   atol=1e-5, err_msg=k)
    # atol admits n_windows * lr of drift: score.bias has an analytically
    # ZERO gradient (the +-1/B cotangents cancel), so f32 reduction-order
    # residue (~1e-7) differs between implementations and adam normalizes
    # whatever sign it gets to a full lr-sized step per window (same
    # effect as the DP bias-gradient sign flips, tests/test_dp.py)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path((sx.g_params, sx.d_params)),
        jax.tree_util.tree_leaves_with_path((sf.g_params, sf.d_params)),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(pa),
        )
