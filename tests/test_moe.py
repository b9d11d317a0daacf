"""Mixture-of-experts blocks (models/transformer.py MoEMLP) and expert
parallelism (parallel/ep.py).

Covers: dispatch/combine exactness against a per-token dense reference,
capacity-overflow passthrough, the Switch aux loss, the train step's
moe_aux wiring, and EP sharding equivalence on the virtual mesh
(pure data x expert and composed data x expert x model), plus the loud
divisibility/family gates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import JointLayout, build_generator, transformer_gan
from music2dance_tpu.models.transformer import MoEMLP
from music2dance_tpu.parallel import make_mesh_ep
from music2dance_tpu.parallel.ep import ep_train_step
from music2dance_tpu.train import TrainConfig, init_state, make_train_step

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
AUDIO = AudioConfig(sample_rate=8000, n_fft=256, win_length=256,
                    hop_length=200, n_mels=40, n_mfcc=13)


def _moe_gan(**gen_over):
    gan = transformer_gan(feature_dim=AUDIO.n_mfcc, layout=LAYOUT)
    gen_kw = dict(hidden_dim=64, head_hidden=32, tr_blocks=2, tr_heads=4,
                  enc_dim=32, noise_dim=8, moe_experts=4, moe_topk=2)
    gen_kw.update(gen_over)
    return dataclasses.replace(
        gan,
        generator=dataclasses.replace(gan.generator, **gen_kw),
        discriminator=dataclasses.replace(
            gan.discriminator, hidden_dim=64, tr_blocks=2, tr_heads=4,
            conv_dim=32,
        ),
    )


def _moe_module(e=4, k=2, cap=8.0, d=16, ratio=2):
    m = MoEMLP(d_model=d, n_experts=e, topk=k, capacity=cap,
               mlp_ratio=ratio, dtype="float32")
    x = jax.random.normal(jax.random.key(0), (2, 10, d))
    v = m.init(jax.random.key(1), x)
    return m, {"params": v["params"]}, x


def _dense_reference(params, x, k):
    """Per-token MoE output with unbounded capacity: the gate-weighted
    sum of each selected expert's MLP — the semantics the dispatch/
    combine einsums must reproduce when nothing overflows."""
    p = params["params"]
    logits = x @ p["router"]["kernel"] + p["router"]["bias"]
    probs = jax.nn.softmax(logits, axis=-1)
    gate_v, gate_i = jax.lax.top_k(probs, k)
    gate_v = gate_v / (jnp.sum(gate_v, -1, keepdims=True) + 1e-9)
    wi, bi = p["wi"], p["bi"]
    wo, bo = p["wo"], p["bo"]

    def token(xt, gv, gi):
        out = jnp.zeros_like(xt)
        for j in range(k):
            e = gi[j]
            h = jax.nn.gelu(xt @ wi[e] + bi[e])
            out = out + gv[j] * (h @ wo[e] + bo[e])
        return out

    return jax.vmap(jax.vmap(token))(x, gate_v, gate_i)


def test_moe_matches_dense_reference_when_nothing_overflows():
    m, params, x = _moe_module(cap=8.0)  # cap >> tokens/expert: no drops
    y = m.apply(params, x)
    ref = _dense_reference(params, x, m.topk)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_deterministic_and_mutable_apply_identical():
    m, params, x = _moe_module()
    y1 = m.apply(params, x)
    y2, sown = m.apply(params, x, mutable=["losses"])
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    (aux,) = sown["losses"]["moe_aux"]
    assert np.isfinite(float(aux))


def test_moe_capacity_overflow_zeroes_dropped_tokens():
    # capacity ~0 -> at most 1 slot per expert per row; later tokens
    # routed to a full expert must contribute zero (the block residual
    # carries them through unchanged). topk=1 so a drop is all-or-
    # nothing per token (with k>1 a token can overflow one expert and
    # keep the other — a partial, not a zero).
    m, params, x = _moe_module(cap=1e-6, k=1)
    y = np.asarray(m.apply(params, x))
    y_full = np.asarray(_moe_module(cap=8.0, k=1)[0].apply(params, x))
    # some tokens dropped (outputs zero), none invented
    dropped = np.all(y == 0.0, axis=-1)
    assert dropped.any(), "expected overflow drops at capacity ~0"
    kept = ~dropped
    np.testing.assert_allclose(y[kept], y_full[kept], rtol=1e-5, atol=1e-5)


def test_moe_aux_is_one_for_uniform_router():
    m, params, x = _moe_module()
    p = jax.tree_util.tree_map(lambda a: a, params)
    p["params"]["router"]["kernel"] = jnp.zeros_like(
        p["params"]["router"]["kernel"])
    p["params"]["router"]["bias"] = jnp.zeros_like(
        p["params"]["router"]["bias"])
    _, sown = m.apply(p, x, mutable=["losses"])
    (aux,) = sown["losses"]["moe_aux"]
    # uniform probs: mean prob = 1/E and top-1 fraction sums to 1, so
    # E * sum_e f_e * P_e == 1 exactly
    assert abs(float(aux) - 1.0) < 1e-5


def test_moe_topk_validation():
    m = MoEMLP(d_model=16, n_experts=4, topk=5, capacity=1.25,
               mlp_ratio=2, dtype="float32")
    x = jnp.zeros((1, 4, 16))
    with pytest.raises(ValueError, match="moe_topk"):
        m.init(jax.random.key(0), x)


def _batch(b, t):
    batch = synthetic_batch(jax.random.key(3), b, t / 30.0, AUDIO, LAYOUT,
                            through_frontend=False)
    return {k: v[:, :t] for k, v in batch.items()}


def test_init_state_filters_sown_collection():
    gan = _moe_gan()
    batch = _batch(2, 12)
    tc = TrainConfig(batch_size=2, clip_seconds=0.4)
    state = init_state(jax.random.key(0), gan, tc, batch)
    assert set(state.g_params) == {"params"}


def test_train_step_reports_and_optimizes_moe_aux():
    gan = _moe_gan()
    batch = _batch(2, 12)
    tc = TrainConfig(batch_size=2, clip_seconds=0.4, moe_aux_weight=0.01)
    state = init_state(jax.random.key(0), gan, tc, batch)
    step = jax.jit(make_train_step(gan, tc))
    new_state, metrics = step(state, batch)
    assert "moe_aux" in metrics and np.isfinite(float(metrics["moe_aux"]))
    # expert weights and the router both received gradient
    for name in ("wi", "wo"):
        before = state.g_params["params"]["block_0"]["moe"][name]
        after = new_state.g_params["params"]["block_0"]["moe"][name]
        assert not np.allclose(np.asarray(before), np.asarray(after))
    rb = state.g_params["params"]["block_0"]["moe"]["router"]["kernel"]
    ra = new_state.g_params["params"]["block_0"]["moe"]["router"]["kernel"]
    assert not np.allclose(np.asarray(rb), np.asarray(ra))


@pytest.mark.parametrize("shape", [(2, 4, 1), (2, 2, 2)])
def test_ep_step_matches_single_device(shape):
    n_data, n_expert, n_model = shape
    gan = _moe_gan()
    b, t = 4, 12
    batch = _batch(b, t)
    tc = TrainConfig(batch_size=b, clip_seconds=0.4, moe_aux_weight=0.01)
    state = init_state(jax.random.key(0), gan, tc, batch)

    ref_step = jax.jit(make_train_step(gan, tc, fused=False))
    ref_state, ref_metrics = ref_step(state, batch)

    mesh = make_mesh_ep(n_data, n_expert, n_model)
    ep_step, ep_state = ep_train_step(gan, tc, mesh, state, donate=False)
    ep_state, ep_metrics = ep_step(ep_state, batch)

    for k in ref_metrics:
        np.testing.assert_allclose(float(ref_metrics[k]),
                                   float(ep_metrics[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_state.g_params)
    flat_e = dict(jax.tree_util.tree_leaves_with_path(ep_state.g_params))
    for path, leaf in flat_r:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_e[path]),
            rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_ep_rejects_dense_generator_and_bad_divisor():
    tc = TrainConfig(batch_size=2, clip_seconds=0.4)
    batch = _batch(2, 12)
    mesh = make_mesh_ep(2, 4)

    dense = _moe_gan(moe_experts=0)
    state = init_state(jax.random.key(0), dense, tc, batch)
    with pytest.raises(ValueError, match="expert parallelism needs"):
        ep_train_step(dense, tc, mesh, state, donate=False)

    odd = _moe_gan(moe_experts=6)
    state = init_state(jax.random.key(0), odd, tc, batch)
    with pytest.raises(ValueError, match="does not divide"):
        ep_train_step(odd, tc, mesh, state, donate=False)
