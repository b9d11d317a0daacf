"""Parallelism COMPOSITIONS (round-3 VERDICT missing #6): real
deployments stack strategies, so each pairing must be equivalence-tested
— FSDP x grad_accum, TP x grad_accum, and FSDP under the TBPTT step —
against the same single-device jit step, on the 8 virtual CPU devices.

grad_accum composes inside make_train_step (the microbatch scan is part
of the step body), so the GSPMD wrappers get it for free STRUCTURALLY —
these tests pin that it also holds NUMERICALLY (the accumulation scan's
per-slice RNG keys must still be global-index-derived under a sharded
batch, and the FSDP all-gathers must not reorder the f32 reductions
beyond tolerance).
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.parallel import (
    fsdp_tbptt_train_step,
    fsdp_train_step,
    make_mesh,
    make_mesh_2d,
    tp_train_step,
)
from music2dance_tpu.train import TrainConfig, init_state, make_train_step
from music2dance_tpu.train.tbptt import make_tbptt_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256,
                    hop_length=200, n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def _setup(tc, seconds=0.5):
    batch = synthetic_batch(jax.random.key(0), tc.batch_size, seconds,
                            AUDIO, LAYOUT, through_frontend=False)
    return init_state(jax.random.key(1), GAN, tc, batch), batch


def _assert_state_close(a, b, rtol=2e-3, atol=5e-5):
    for (pa, x), (_, y) in zip(
        jax.tree_util.tree_leaves_with_path(a),
        jax.tree_util.tree_leaves_with_path(b),
    ):
        if x.dtype == jax.numpy.uint32:
            continue
        key = jax.tree_util.keystr(pa)
        if key.endswith("['bias']") and "score" in key:
            continue  # zero-true-gradient knife edge (tests/test_tp.py)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol, err_msg=key)


def _run_pair(tc, sharded_factory, steps=2, seconds=0.5):
    """Run `steps` of the single-device step and the sharded step from
    the same init; return both final states + last metrics."""
    state, batch = _setup(tc, seconds)

    ref_step = jax.jit(make_train_step(GAN, tc))
    ref_state, ref_m = state, None
    for _ in range(steps):
        ref_state, ref_m = ref_step(ref_state, batch)

    fn, sh_state = sharded_factory(state)
    sh_m = None
    for _ in range(steps):
        sh_state, sh_m = fn(sh_state, batch)
    return ref_state, ref_m, sh_state, sh_m


@pytest.mark.parametrize("accum", [2, 4])
def test_fsdp_with_grad_accum(accum):
    tc = TrainConfig(batch_size=8, grad_accum=accum, ema_decay=0.99)
    mesh = make_mesh(8)
    ref_state, ref_m, sh_state, sh_m = _run_pair(
        tc, lambda s: fsdp_train_step(GAN, tc, mesh, s, donate=False,
                                      min_size=128))
    for k in ref_m:
        np.testing.assert_allclose(float(sh_m[k]), float(ref_m[k]),
                                   rtol=2e-3, atol=5e-5, err_msg=k)
    _assert_state_close(sh_state.g_params, ref_state.g_params)
    _assert_state_close(sh_state.d_params, ref_state.d_params)
    _assert_state_close(sh_state.ema_g_params, ref_state.ema_g_params)


def test_tp_with_grad_accum():
    tc = TrainConfig(batch_size=8, grad_accum=2, n_critic=2)
    mesh = make_mesh_2d(2, 4)  # data=2 x model=4
    ref_state, ref_m, sh_state, sh_m = _run_pair(
        tc, lambda s: tp_train_step(GAN, tc, mesh, s, donate=False))
    for k in ref_m:
        np.testing.assert_allclose(float(sh_m[k]), float(ref_m[k]),
                                   rtol=2e-3, atol=5e-5, err_msg=k)
    _assert_state_close(sh_state.g_params, ref_state.g_params)
    _assert_state_close(sh_state.d_params, ref_state.d_params)


def test_fsdp_tbptt_equals_single_device():
    """FSDP under the TBPTT window-scan step: the long-clip memory lever
    (windows) composes with the state-memory lever (ZeRO-3)."""
    tc = TrainConfig(batch_size=8, tbptt_window=5, ema_decay=0.99)
    state, batch = _setup(tc, seconds=1.0)
    t = batch["feats"].shape[1]
    w = tc.tbptt_window
    batch = jax.tree.map(lambda x: x[:, : (t // w) * w], batch)

    ref_step = jax.jit(make_tbptt_train_step(GAN, tc))
    ref_state, ref_m = ref_step(state, batch)
    ref_state, ref_m = ref_step(ref_state, batch)

    mesh = make_mesh(8)
    fn, sh_state = fsdp_tbptt_train_step(GAN, tc, mesh, state, donate=False,
                                         min_size=128)
    sh_state, sh_m = fn(sh_state, batch)
    sh_state, sh_m = fn(sh_state, batch)

    for k in ref_m:
        np.testing.assert_allclose(float(sh_m[k]), float(ref_m[k]),
                                   rtol=2e-3, atol=5e-5, err_msg=k)
    _assert_state_close(sh_state.g_params, ref_state.g_params)
    _assert_state_close(sh_state.d_params, ref_state.d_params)
    _assert_state_close(sh_state.ema_g_params, ref_state.ema_g_params)

    # FSDP actually sharded something: a large kernel's addressable
    # shard is 1/8th of the logical leaf
    hh = sh_state.g_params["params"]["step"]["core"]["cell_l0"]["hh"]["kernel"]
    shard = hh.addressable_shards[0].data
    assert shard.shape[1] * 8 == hh.shape[1]


def test_fsdp_tbptt_rejects_meshes_without_data_axis():
    tc = TrainConfig(batch_size=8, tbptt_window=5)
    state, _ = _setup(tc, seconds=1.0)
    mesh = make_mesh_2d(1, 8)
    with pytest.raises(ValueError, match="no data axis"):
        fsdp_tbptt_train_step(GAN, tc, mesh, state)
