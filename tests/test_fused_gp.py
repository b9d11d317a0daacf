"""Second-order fused GP op (ops/fused_gp.py): the input-grad forward and
its hand-derived VJP must match pure-XLA autodiff exactly (interpret mode,
f32). The reference scan is built from the same gate algebra traced
through lax.scan so jax.grad/jax.grad-of-grad are the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import DiscriminatorConfig, JointLayout
from music2dance_tpu.ops.fused_critic import (
    _recompute_core,
    critic_weight_names,
    extract_critic_weights,
)
from music2dance_tpu.ops.fused_gp import make_scan_input_grad

from music2dance_tpu.ops.cell_math import gate_factor, state_slots

LAYOUT = JointLayout(n_joints=5, joint_dim=3)
B, T, H = 3, 13, 32


def make_cfg(layers, cell="gru"):
    return DiscriminatorConfig(
        layout=LAYOUT, feature_dim=7, conv_dim=8, conv_layers=1,
        hidden_dim=H, rnn_layers=layers, cell=cell,
    )


def make_weights(cfg, key):
    """Random weight tuple in critic_weight_names order."""
    g = gate_factor(cfg.cell)
    ks = jax.random.split(key, 8)
    ws = []
    i = 0
    for n in critic_weight_names(cfg):
        if n.endswith(".kernel"):
            ws.append(jax.random.normal(ks[i], (H, g * H)) * 0.3)
        else:
            ws.append(jax.random.normal(ks[i], (g * H,)) * 0.1)
        i += 1
    return tuple(ws)


def htop_xla(gi_tm, weights, cfg):
    """Pure-XLA reference scan over the same (cell-generic) gate algebra;
    jax autodiff through it is the first/second-order oracle."""
    names = critic_weight_names(cfg)
    wd = {n: (w if w.ndim > 1 else w[None, :]).astype(jnp.float32)
          for n, w in zip(names, weights)}
    dot = lambda a, c: jnp.dot(a, c, preferred_element_type=jnp.float32)
    layers = cfg.rnn_layers
    lstm = cfg.cell == "lstm"

    def step(state, gi_t):
        hs = [state[l] for l in range(layers)]
        cs = [state[layers + l] for l in range(layers)] if lstm else None
        acts = _recompute_core(gi_t, hs, wd, cfg, dot, cs)
        rows = [a["h_new"] for a in acts]
        if lstm:
            rows += [a["c_new"] for a in acts]
        return jnp.stack(rows), acts[-1]["h_new"]

    sl = state_slots(cfg.cell) * layers
    s0 = jnp.zeros((sl, gi_tm.shape[1], cfg.hidden_dim))
    _, htop = jax.lax.scan(step, s0, gi_tm)
    return htop  # [T, B, H]


def ref_input_grad(gi_tm, gcot_tm, weights, cfg):
    return jax.grad(lambda g: jnp.sum(gcot_tm * htop_xla(g, weights, cfg)))(gi_tm)


def setup(layers, cell="gru"):
    cfg = make_cfg(layers, cell)
    weights = make_weights(cfg, jax.random.key(0))
    g = gate_factor(cell)
    gi = jax.random.normal(jax.random.key(1), (T, B, g * H)) * 0.5
    gcot = jax.random.normal(jax.random.key(2), (T, B, H)) * 0.5
    return cfg, weights, gi, gcot


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
def test_input_grad_forward(layers, cell):
    cfg, weights, gi, gcot = setup(layers, cell)
    op = make_scan_input_grad(cfg, tb=4)
    out = np.asarray(op(gi, gcot, weights))
    ref = np.asarray(ref_input_grad(gi, gcot, weights, cfg))
    scale = max(np.abs(ref).max(), 1e-6)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-6 * scale)


@pytest.mark.parametrize("cell", ["gru", "lstm"])
@pytest.mark.parametrize("layers", [1, 2])
def test_second_order_vjp(layers, cell):
    """grad of a nonlinear functional of the input-grad wrt gi, gcot AND
    the weights — the full hand-derived Hessian-vector path."""
    cfg, weights, gi, gcot = setup(layers, cell)
    op = make_scan_input_grad(cfg, tb=4)
    probe = jax.random.normal(jax.random.key(3), gi.shape)

    def rho(dgi):  # nonlinear so the cotangent u depends on dgi
        return jnp.sum(jnp.tanh(dgi * probe))

    f_fused = lambda g, c, w: rho(op(g, c, w))
    f_ref = lambda g, c, w: rho(ref_input_grad(g, c, w, cfg))

    rv = f_ref(gi, gcot, weights)
    ov = f_fused(gi, gcot, weights)
    np.testing.assert_allclose(float(ov), float(rv), rtol=1e-5)

    ref_grads = jax.grad(f_ref, argnums=(0, 1, 2))(gi, gcot, weights)
    out_grads = jax.grad(f_fused, argnums=(0, 1, 2))(gi, gcot, weights)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_grads),
        jax.tree_util.tree_leaves_with_path(out_grads),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-5 * scale,
                                   err_msg=jax.tree_util.keystr(pa))


@pytest.mark.parametrize("cell", ["gru", "lstm"])
def test_gp_loss_grads_match_xla(cell):
    """End-to-end WGAN-GP shape: gp = mean((||dgi||-1)^2); grads wrt
    weights must match full XLA second-order autodiff."""
    cfg, weights, gi, gcot = setup(2, cell)
    op = make_scan_input_grad(cfg, tb=4)

    def gp(dgi):
        sq = jnp.sum(dgi * dgi, axis=(0, 2))
        return jnp.mean((jnp.sqrt(sq + 1e-12) - 1.0) ** 2)

    ref = jax.grad(lambda w: gp(ref_input_grad(gi, gcot, w, cfg)))(weights)
    out = jax.grad(lambda w: gp(op(gi, gcot, w)))(weights)
    for n, a, b in zip(critic_weight_names(cfg), ref, out):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=2e-3, atol=2e-5 * scale, err_msg=n)
