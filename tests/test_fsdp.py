"""FSDP (ZeRO-3 via GSPMD) equivalence + layout on the 8 virtual CPU
devices.

Sharding annotations never change results — the FSDP step (weights,
Adam moments, and EMA sharded over the data axis) must equal the
single-device jit step up to f32 reduction order, both pure-data and
composed with the model axis. The layout rule itself is pinned
structurally and by addressable-shard shapes
(music2dance_tpu/parallel/fsdp.py rationale).
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
    fsdp_report,
    fsdp_specs,
    fsdp_train_step,
    make_mesh,
    make_mesh_2d,
)
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def _state(tc=None, gan=GAN):
    tc = tc or TrainConfig(batch_size=8)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    return init_state(jax.random.key(1), gan, tc, batch), batch, tc


def _assert_state_close(a, b, rtol=2e-3, atol=5e-5):
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


def test_fsdp_spec_rules():
    state, _, _ = _state()
    # pure data axis, default min_size: only the O(W^2) leaves shard
    specs = fsdp_specs(state, 8)
    g = specs.g_params["params"]
    # hh kernel [64, 192]: large enough; largest divisible dim is 192
    assert g["step"]["core"]["cell_l0"]["hh"]["kernel"] == P(None, "data")
    # its bias [192] is under min_size -> replicated
    assert g["step"]["core"]["cell_l0"]["hh"]["bias"] == P()
    # head_fc kernel [64, 32] = 2048 elems < 4096 -> replicated
    assert g["step"]["head_fc"]["kernel"] == P()
    # Adam moments mirror the param layout
    assert (
        specs.opt_g[0].mu["params"]["step"]["core"]["cell_l0"]["hh"]["kernel"]
        == P(None, "data")
    )
    # EMA too
    assert (
        specs.ema_g_params is None
        or specs.ema_g_params == P()  # ema disabled in this TrainConfig
    )
    # non-float leaves stay unsharded
    assert specs.step == P()

    # composed with a model axis: FSDP takes a FREE dim of the TP layout
    specs2 = fsdp_specs(state, 2, axes=("model",), min_size=64)
    g2 = specs2.g_params["params"]
    # row-parallel hh kernel [64(model), 192]: data goes on dim 1
    assert g2["step"]["core"]["cell_l0"]["hh"]["kernel"] == P("model", "data")
    # column-parallel head_fc [64, 32(model)]: data on the contraction dim
    assert g2["step"]["head_fc"]["kernel"] == P("data", "model")

    # report: most float bytes shard on the pure-data layout
    rep = fsdp_report(state, 8, min_size=1024)
    assert rep["sharded_frac"] > 0.5
    assert rep["per_device_frac"] < 0.6


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_fsdp_step_equals_single_device(cell):
    gan = dataclasses.replace(
        GAN,
        generator=dataclasses.replace(GAN.generator, cell=cell),
        discriminator=dataclasses.replace(GAN.discriminator, cell=cell),
    )
    tc = TrainConfig(batch_size=8, n_critic=2, ema_decay=0.99)
    state, batch, _ = _state(tc, gan)

    ref_step = jax.jit(make_train_step(gan, tc))
    ref_state, ref_metrics = ref_step(state, batch)
    ref_state, ref_metrics = ref_step(ref_state, batch)

    mesh = make_mesh(8)
    fn, sh_state = fsdp_train_step(gan, tc, mesh, state, donate=False,
                                   min_size=128)
    sh_state, metrics = fn(sh_state, batch)
    sh_state, metrics = fn(sh_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=5e-5,
            err_msg=f"metric {k}",
        )
    _assert_state_close(sh_state.g_params, ref_state.g_params)
    _assert_state_close(sh_state.d_params, ref_state.d_params)
    _assert_state_close(sh_state.ema_g_params, ref_state.ema_g_params)


def test_fsdp_composes_with_tp():
    tc = TrainConfig(batch_size=8)
    state, batch, _ = _state(tc)

    ref_state, ref_metrics = jax.jit(make_train_step(GAN, tc))(state, batch)

    mesh = make_mesh_2d(2, 4)  # data=2 (fsdp) x model=4 (tp)
    fn, sh_state = fsdp_train_step(GAN, tc, mesh, state, donate=False,
                                   min_size=128)
    sh_state, metrics = fn(sh_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=5e-5,
            err_msg=f"metric {k}",
        )
    _assert_state_close(sh_state.g_params, ref_state.g_params)
    _assert_state_close(sh_state.d_params, ref_state.d_params)


def test_fsdp_shards_memory():
    """The point of FSDP: per-device parameter/optimizer bytes shrink."""
    tc = TrainConfig(batch_size=8, ema_decay=0.99)
    state, batch, _ = _state(tc)
    mesh = make_mesh(8)
    fn, sh_state = fsdp_train_step(GAN, tc, mesh, state, donate=False,
                                   min_size=128)
    hh = sh_state.g_params["params"]["step"]["core"]["cell_l0"]["hh"]["kernel"]
    assert hh.shape == (64, 192)
    shard = hh.addressable_shards[0].data
    assert shard.shape == (64, 24)  # 192 / 8 on the data axis
    mu = sh_state.opt_g[0].mu["params"]["step"]["core"]["cell_l0"]["hh"]["kernel"]
    assert mu.addressable_shards[0].data.shape == (64, 24)
    ema = sh_state.ema_g_params["params"]["step"]["core"]["cell_l0"]["hh"]["kernel"]
    assert ema.addressable_shards[0].data.shape == (64, 24)
    # and the step still runs from this layout
    sh_state, metrics = fn(sh_state, batch)
    assert np.isfinite(float(metrics["g_loss"]))


def test_fsdp_requires_data_axis():
    tc = TrainConfig(batch_size=8)
    state, _, _ = _state(tc)
    mesh = make_mesh_2d(1, 8)  # degenerate data axis
    with pytest.raises(ValueError, match="data axis"):
        fsdp_train_step(GAN, tc, mesh, state)
