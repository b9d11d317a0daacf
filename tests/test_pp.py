"""Pipeline parallelism (parallel/pp.py): GPipe schedule over the
attention generator's block stack.

Covers: forward exactness vs the standard module (the schedule moves
WHERE blocks run, never what they compute), gradient exactness through
the ppermute/scan pipeline, full train-step equivalence (params, Adam
moments via pp_import_state on a mid-run state, EMA, metrics), the
stack/unstack round trip, and the loud family/divisibility gates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, build_generator, transformer_gan
from music2dance_tpu.parallel.pp import (
    make_mesh_pp,
    make_pp_generator_apply,
    pp_export_params,
    pp_import_state,
    pp_stack_params,
    pp_train_step,
    pp_unstack_params,
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


def _gen_params(gan, b=8, t=12, live_head=True):
    gen = build_generator(gan.generator)
    feats = jax.random.normal(jax.random.key(0), (b, t, AUDIO.n_mfcc))
    z = jax.random.normal(jax.random.key(1), (b, gan.generator.noise_dim))
    params = gen.init(jax.random.key(2), feats, z)
    # keep only the trainable collection: MoE generators sow their aux
    # into "losses" at init too, and a stale sown value left in the
    # variables dict would be APPENDED to by every mutable apply —
    # polluting any aux computed from this tree (init_state strips it
    # the same way, train/step.py:82)
    params = {"params": params["params"]}
    if live_head:
        # head_out is zero-init (DiT stability pattern) which makes every
        # pose — and thus every gradient — exactly zero; give it weight
        ho = params["params"]["head_out"]["kernel"]
        params["params"]["head_out"]["kernel"] = 0.1 * jax.random.normal(
            jax.random.key(9), ho.shape, ho.dtype
        )
    return gen, params, feats, z


def _assert_trees_close(a, b, rtol, atol):
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(fa) == len(fb)
    for path, leaf in fa:
        key = jax.tree_util.keystr(path)
        if key.endswith("['bias']") and (
            "score" in key or "['k']" in key or "ln_f" in key
        ):
            # zero-true-gradient knife edges (see tests/test_tp.py
            # _assert_state_close for the derivation): their Adam
            # updates are rounding residues, not signal
            continue
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(fb[path]), rtol=rtol, atol=atol,
            err_msg=key,
        )


def test_stack_unstack_round_trip_exact():
    gan = _gan()
    _, params, _, _ = _gen_params(gan)
    rt = pp_unstack_params(pp_stack_params(params))
    fa = jax.tree_util.tree_leaves_with_path(params)
    fb = dict(jax.tree_util.tree_leaves_with_path(rt))
    for path, leaf in fa:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(fb[path]))


@pytest.mark.parametrize("n_stage,n_micro", [(2, 2), (4, 2), (2, 4)])
def test_pp_forward_matches(n_stage, n_micro):
    gan = _gan()
    gen, params, feats, z = _gen_params(gan)
    ref = gen.apply(params, feats, z)
    mesh = make_mesh_pp(2, n_stage)  # b_local = 4 per data shard
    apply = make_pp_generator_apply(gan.generator, mesh, n_micro)
    got = jax.jit(apply)(pp_stack_params(params), feats, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pp_grads_match():
    gan = _gan()
    gen, params, feats, z = _gen_params(gan)
    mesh = make_mesh_pp(2, 4)
    apply = make_pp_generator_apply(gan.generator, mesh, n_micro=2)
    stacked = pp_stack_params(params)

    g_pp = jax.jit(jax.grad(
        lambda p: jnp.mean(apply(p, feats, z) ** 2)))(stacked)
    g_ref = jax.grad(
        lambda p: jnp.mean(gen.apply(p, feats, z) ** 2))(params)
    _assert_trees_close(pp_stack_params(g_ref), g_pp,
                        rtol=1e-4, atol=1e-6)


def _batch(b, t):
    batch = synthetic_batch(jax.random.key(3), b, t / 30.0, AUDIO, LAYOUT,
                            through_frontend=False)
    return {k: v[:, :t] for k, v in batch.items()}


def test_pp_train_step_matches_single_device():
    gan = _gan()
    b, t = 8, 12
    batch = _batch(b, t)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4, ema_decay=0.99)
    state = init_state(jax.random.key(4), gan, tc, batch)

    ref_step = jax.jit(make_train_step(gan, tc, fused=False))
    r1, ref_metrics = ref_step(state, batch)
    r2, _ = ref_step(r1, batch)

    # import a MID-RUN state (after one reference step): exercises the
    # Adam-moment mapping inside pp_import_state, not just zeros
    mesh = make_mesh_pp(2, 4)
    step, pst = pp_train_step(gan, tc, mesh, state, n_micro=2, donate=False)
    pst, m = step(pst, batch)
    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]), float(m[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    _assert_trees_close(r1.g_params, pp_export_params(pst.g_params),
                        rtol=5e-4, atol=5e-5)
    _assert_trees_close(r1.ema_g_params, pp_export_params(pst.ema_g_params),
                        rtol=5e-4, atol=5e-5)

    step2, pst2 = pp_train_step(gan, tc, mesh, r1, n_micro=2, donate=False)
    pst2, _ = step2(pst2, batch)
    _assert_trees_close(r2.g_params, pp_export_params(pst2.g_params),
                        rtol=5e-4, atol=5e-5)
    _assert_trees_close(r2.d_params, pst2.d_params, rtol=5e-4, atol=5e-5)


def _moe_microbatched_ref(gan, n_groups):
    """Dense reference with PP's microbatched-MoE aux semantics: poses
    from the standard full-batch apply (MoE routing is per-example, so
    microbatching never changes them); Switch aux computed per
    contiguous group of B/n_groups examples — exactly the (data shard,
    microbatch) slices the pipeline sees — and group-averaged."""
    gen = build_generator(gan.generator)

    def ref_apply(params, feats, z):
        poses = gen.apply(params, feats, z)
        mb = feats.shape[0] // n_groups
        auxes = []
        for g in range(n_groups):
            sl = slice(g * mb, (g + 1) * mb)
            _, sown = gen.apply(params, feats[sl], z[sl],
                                mutable=["losses"])
            vals = jax.tree.leaves(sown)
            auxes.append(sum(vals) / len(vals))
        return poses, sum(auxes) / len(auxes)

    return ref_apply


@pytest.mark.parametrize("n_stage,n_micro", [(2, 2), (4, 2)])
def test_pp_moe_forward_and_aux_match(n_stage, n_micro):
    gan = _gan(moe_experts=4, moe_topk=2)
    gen, params, feats, z = _gen_params(gan)
    n_data = 2
    ref_apply = _moe_microbatched_ref(gan, n_data * n_micro)
    ref_poses, ref_aux = ref_apply(params, feats, z)

    mesh = make_mesh_pp(n_data, n_stage)
    apply = make_pp_generator_apply(gan.generator, mesh, n_micro)
    got_poses, got_aux = jax.jit(apply)(pp_stack_params(params), feats, z)
    np.testing.assert_allclose(np.asarray(got_poses), np.asarray(ref_poses),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got_aux), float(ref_aux),
                               rtol=1e-5, atol=1e-6)
    # ramp-tick masking matters: the garbage ticks' router statistics
    # would otherwise drag the aux toward the all-zero-input value
    assert np.isfinite(float(got_aux)) and float(got_aux) >= 1.0 - 1e-3


def test_pp_moe_train_step_matches_microbatched_reference():
    gan = _gan(moe_experts=4, moe_topk=2)
    b, t = 8, 12
    batch = _batch(b, t)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4, ema_decay=0.99,
                     moe_aux_weight=0.01)
    state = init_state(jax.random.key(4), gan, tc, batch)

    n_data, n_stage, n_micro = 2, 2, 2
    ref_apply = _moe_microbatched_ref(gan, n_data * n_micro)
    ref_step = jax.jit(make_train_step(gan, tc, fused=False,
                                       gen_apply=ref_apply,
                                       gen_apply_aux=True))
    r1, ref_metrics = ref_step(state, batch)
    assert "moe_aux" in ref_metrics

    mesh = make_mesh_pp(n_data, n_stage)
    step, pst = pp_train_step(gan, tc, mesh, state, n_micro=n_micro,
                              donate=False)
    pst, m = step(pst, batch)
    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]), float(m[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    _assert_trees_close(r1.g_params, pp_export_params(pst.g_params),
                        rtol=5e-4, atol=5e-5)
    _assert_trees_close(r1.d_params, pst.d_params, rtol=5e-4, atol=5e-5)


def test_gen_apply_aux_contract_gates():
    gan = _gan(moe_experts=4)
    tc = TrainConfig(batch_size=8, clip_seconds=0.4)
    with pytest.raises(ValueError, match="gen_apply_aux"):
        make_train_step(gan, tc, fused=False,
                        gen_apply=lambda p, f, z: f)
    with pytest.raises(ValueError, match="requires a gen_apply"):
        make_train_step(gan, tc, fused=False, gen_apply_aux=True)


def test_pp_gates():
    b = 8
    batch = _batch(b, 12)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4)
    mesh = make_mesh_pp(2, 4)

    from music2dance_tpu.models import full_gan

    rnn = full_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    state = init_state(jax.random.key(0), rnn, tc, batch)
    with pytest.raises(ValueError, match="recurrent"):
        pp_train_step(rnn, tc, mesh, state, donate=False)

    odd = _gan(tr_blocks=3)
    state = init_state(jax.random.key(0), odd, tc, batch)
    with pytest.raises(ValueError, match="does not divide"):
        pp_train_step(odd, tc, mesh, state, donate=False)

    good = _gan()
    state = init_state(jax.random.key(0), good, tc, batch)
    with pytest.raises(ValueError, match="batch_size"):
        pp_train_step(good, tc, mesh, state, n_micro=3, donate=False)
