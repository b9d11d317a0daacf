"""Tensor-parallel (GSPMD) equivalence on the 8 virtual CPU devices.

Sharding annotations never change results — the TP step over a
(data x model) mesh must equal the single-device jit step up to f32
reduction order. The specs themselves are also pinned structurally:
row-parallel gate matmuls, Megatron column->row head pair, replicated
small weights (music2dance_tpu/parallel/tp.py rationale).
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.infer.decode import decode_poses
from music2dance_tpu.models import JointLayout, tiny_gan
from music2dance_tpu.parallel import (
    make_mesh_2d,
    tp_decode,
    tp_specs,
    tp_train_step,
)
from music2dance_tpu.parallel.tp import check_tp_divisibility
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256, hop_length=200,
                    n_mels=40, n_mfcc=13)
GAN = tiny_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)


def _with_cell(gan, cell):
    return dataclasses.replace(
        gan,
        generator=dataclasses.replace(gan.generator, cell=cell),
        discriminator=dataclasses.replace(gan.discriminator, cell=cell),
    )


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
            # Zero-true-gradient knife edges: parameters that shift the
            # critic score identically for every input cancel
            # algebraically between the real and fake WGAN terms (the
            # score bias, and the final-LN bias which feeds the score
            # linearly), and the attention KEY bias shifts every logit
            # of a query equally (softmax-invariant). Their computed
            # gradients are reduction-order rounding residues (~1e-8)
            # that Adam amplifies to O(lr) updates — both
            # implementations produce noise here; comparing it compares
            # rounding order, not correctness.
            continue
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=rtol, atol=atol,
            err_msg=key,
        )


def test_tp_spec_rules():
    tc = TrainConfig(batch_size=8)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    specs = tp_specs(state)
    g = specs.g_params["params"]
    # row-parallel gate matmul: contraction dim sharded, bias replicated
    assert g["step"]["core"]["cell_l0"]["hh"]["kernel"] == P("model", None)
    assert g["step"]["core"]["cell_l0"]["hh"]["bias"] == P()
    # Megatron head pair: column then row
    assert g["step"]["head_fc"]["kernel"] == P(None, "model")
    assert g["step"]["head_fc"]["bias"] == P("model")
    assert g["step"]["head_out"]["kernel"] == P("model", None)
    assert g["step"]["head_out"]["bias"] == P()
    # small weights replicated
    assert g["encoder"]["conv_0"]["kernel"] == P()
    assert g["ih0_static"]["kernel"] == P()
    assert g["step"]["ih0_pose"]["kernel"] == P()
    # critic: recurrent core row-parallel, score row-parallel
    d = specs.d_params["params"]
    assert d["step"]["core"]["cell_l0"]["hh"]["kernel"] == P("model", None)
    assert d["step"]["score"]["kernel"] == P("model", None)
    # optimizer moments and EMA mirror the param specs
    assert specs.opt_g[0].mu["params"]["step"]["head_fc"]["kernel"] == P(None, "model")


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_tp_step_equals_single_device(cell):
    gan = _with_cell(GAN, cell)
    tc = TrainConfig(batch_size=8, n_critic=2, ema_decay=0.99)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), gan, tc, batch)

    ref_step = jax.jit(make_train_step(gan, tc))
    ref_state, ref_metrics = ref_step(state, batch)
    ref_state, ref_metrics = ref_step(ref_state, batch)  # 2 steps

    mesh = make_mesh_2d(2, 4)
    tp_step, tp_state = tp_train_step(gan, tc, mesh, state, donate=False)
    tp_state, tp_metrics = tp_step(tp_state, batch)
    tp_state, tp_metrics = tp_step(tp_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(tp_metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=5e-5,
            err_msg=f"metric {k}",
        )
    _assert_state_close(tp_state.g_params, ref_state.g_params)
    _assert_state_close(tp_state.d_params, ref_state.d_params)
    _assert_state_close(tp_state.ema_g_params, ref_state.ema_g_params)


def test_tp_step_tcn_multiscale_critic():
    gan = dataclasses.replace(
        GAN,
        discriminator=dataclasses.replace(
            GAN.discriminator, rnn_layers=0, n_scales=2
        ),
    )
    tc = TrainConfig(batch_size=8)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), gan, tc, batch)

    ref_state, ref_metrics = jax.jit(make_train_step(gan, tc))(state, batch)
    mesh = make_mesh_2d(4, 2)
    tp_step, tp_state = tp_train_step(gan, tc, mesh, state, donate=False)
    tp_state, tp_metrics = tp_step(tp_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(tp_metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=5e-5,
            err_msg=f"metric {k}",
        )
    _assert_state_close(tp_state.d_params, ref_state.d_params)


def test_tp_step_transformer_family():
    """Attention-family TP: q/k/v column-parallel (heads shard with the
    output dim — the [B,h,T,T] logits shard on heads), o/mlp_out
    row-parallel. Must equal the single-device step."""
    from music2dance_tpu.models import transformer_gan

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
    tc = TrainConfig(batch_size=8)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), gan, tc, batch)
    # head_out is zero-init for training stability, which makes every
    # upstream generator gradient a pure rounding residue at step 1 (a
    # knife edge, not a real comparison) — give it weight first
    gp = jax.tree_util.tree_map(lambda x: x, state.g_params)
    ho = gp["params"]["head_out"]["kernel"]
    gp["params"]["head_out"]["kernel"] = (
        jax.random.normal(jax.random.key(9), ho.shape, ho.dtype) * 0.02
    )
    state = state.replace(g_params=gp)

    specs = tp_specs(state)
    g = specs.g_params["params"]["block_0"]
    assert g["attn"]["q"]["kernel"] == P(None, "model")
    assert g["attn"]["o"]["kernel"] == P("model", None)
    assert g["mlp_in"]["kernel"] == P(None, "model")
    assert g["mlp_out"]["kernel"] == P("model", None)
    assert g["ln1"]["scale"] == P()

    ref_state, ref_metrics = jax.jit(make_train_step(gan, tc))(state, batch)
    mesh = make_mesh_2d(2, 4)
    tp_step, tp_state = tp_train_step(gan, tc, mesh, state, donate=False)
    tp_state, tp_metrics = tp_step(tp_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(
            float(tp_metrics[k]), float(ref_metrics[k]), rtol=2e-3, atol=5e-5,
            err_msg=f"metric {k}",
        )
    _assert_state_close(tp_state.g_params, ref_state.g_params)
    _assert_state_close(tp_state.d_params, ref_state.d_params)


def test_tp_decode_equals_single_device():
    tc = TrainConfig(batch_size=8)
    batch = synthetic_batch(
        jax.random.key(0), 8, 0.5, AUDIO, LAYOUT, through_frontend=False
    )
    state = init_state(jax.random.key(1), GAN, tc, batch)
    feats = batch["feats"]
    lengths = np.full((8,), feats.shape[1], np.int32)
    key = jax.random.key(7)

    ref = decode_poses(state.g_params, GAN.generator, feats, key,
                       lengths=lengths, impl="xla")

    mesh = make_mesh_2d(2, 4)
    fn, p_sh = tp_decode(GAN, mesh, state.g_params)
    got = fn(p_sh, feats, key, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=5e-5)


def test_tp_divisibility_is_loud():
    gan = dataclasses.replace(
        GAN, generator=dataclasses.replace(GAN.generator, hidden_dim=60)
    )
    with pytest.raises(ValueError, match="hidden_dim=60"):
        check_tp_divisibility(gan, 8)
