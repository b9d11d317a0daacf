"""Second-order flash attention (ops/flash2.py).

Covers, bottom-up:
- chunked exact attention vs the naive [T, T] oracle: forward, first-
  order gradients, and the GP-shaped reverse-over-reverse second order;
- the Pallas kernels in interpret mode vs chunked (forward + lse and the
  self-contained backward), causal and bidirectional, padded lengths;
- the AD glue (recursive custom_jvp + linear_call): flash2_attention's
  grads at every order match naive attention, including with dead
  tangents (constant k/v) — the symbolic-zeros path linear_call needs;
- the critic seat: TransformerCritic(attn_impl='flash2') WGAN-GP value
  and d_params-gradients match the attn_impl='xla' critic, and a
  finite-difference probe confirms the gp gradient itself (round-3
  VERDICT missing #4's done-criteria at CPU scale; the compiled-kernel
  parity lives in benchmarks/run_flash2_parity.py).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from music2dance_tpu.models import JointLayout, build_discriminator, transformer_gan
from music2dance_tpu.ops.flash2 import (
    _make_core,
    _pallas_bwd,
    _pallas_fwd,
    chunked_attention,
    flash2_attention,
    naive_attention,
    supports_flash2,
)

LAYOUT = JointLayout(n_joints=5, joint_dim=3)


def _qkv(r=3, t=37, d=16, seed=0, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(
        jax.random.normal(k, (r, t, d), dtype) for k in ks
    )


# ---------------------------------------------------------------------------
# chunked vs naive
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [8, 37, 131])
def test_chunked_matches_naive_forward(causal, t):
    q, k, v = _qkv(t=t)
    out = chunked_attention(q, k, v, causal=causal, block_q=32, block_k=32)
    ref = naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_chunked_matches_naive_grads(causal):
    q, k, v = _qkv(t=37)

    def loss(f, q, k, v):
        return jnp.sum(jnp.cos(f(q, k, v)))

    ch = functools.partial(chunked_attention, causal=causal,
                           block_q=32, block_k=32)
    na = functools.partial(naive_attention, causal=causal)
    g = jax.grad(functools.partial(loss, ch), argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(functools.partial(loss, na), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def _gp_shaped(attn_fn, w, x, k, v):
    """reverse-over-reverse with the GP's exact structure: the gradient
    wrt parameters of the squared input-gradient norm of a scalar."""

    def scalar(x):
        return jnp.sum(jnp.tanh(attn_fn(x @ w, k, v)))

    gx = jax.grad(scalar)(x)
    return jnp.sum(gx * gx)


@pytest.mark.parametrize("causal", [False, True])
def test_chunked_second_order_matches_naive(causal):
    q, k, v = _qkv(t=37)
    w = jax.random.normal(jax.random.key(7), (16, 16))
    ch = functools.partial(chunked_attention, causal=causal,
                           block_q=32, block_k=32)
    na = functools.partial(naive_attention, causal=causal)
    g = jax.grad(lambda w: _gp_shaped(ch, w, q, k, v))(w)
    gr = jax.grad(lambda w: _gp_shaped(na, w, q, k, v))(w)
    np.testing.assert_allclose(g, gr, rtol=2e-4, atol=2e-4)


# ---------------------------------------------------------------------------
# Pallas kernels, interpret mode
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [16, 37, 200])
def test_pallas_fwd_interpret(causal, t):
    q, k, v = _qkv(t=t)
    scale = 1.0 / np.sqrt(q.shape[-1])
    o, lse = _pallas_fwd(q, k, v, causal, scale, interpret=True,
                         with_lse=True)
    ref = naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(o, ref, rtol=2e-5, atol=2e-5)
    # lse checked against the naive logsumexp of masked logits
    s = jnp.einsum("rtd,rsd->rts", q, k) * scale
    if causal:
        s = jnp.where(jnp.tril(jnp.ones((t, t), bool))[None], s, -1e30)
    np.testing.assert_allclose(
        lse[:, :t], jax.scipy.special.logsumexp(s, axis=-1),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("t", [16, 37])
def test_pallas_bwd_interpret(causal, t):
    q, k, v = _qkv(t=t)
    c = jax.random.normal(jax.random.key(9), q.shape)
    scale = 1.0 / np.sqrt(q.shape[-1])
    dq, dk, dv = _pallas_bwd(q, k, v, c, causal, scale, interpret=True)

    def fwd(q, k, v):
        return naive_attention(q, k, v, causal=causal)

    _, pull = jax.vjp(fwd, q, k, v)
    rq, rk, rv = pull(c)
    np.testing.assert_allclose(dq, rq, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dk, rk, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dv, rv, rtol=1e-4, atol=1e-5)


def test_supports_flash2_envelope():
    assert supports_flash2(1024, 128)
    assert not supports_flash2(65536, 128)


# ---------------------------------------------------------------------------
# the public op: every order, dead tangents, jit
# ---------------------------------------------------------------------------

def _bthd(t=37, d=16, b=2, h=3, seed=0):
    ks = jax.random.split(jax.random.key(seed), 3)
    return tuple(jax.random.normal(k, (b, t, h, d)) for k in ks)


def _naive_bthd(q, k, v, causal):
    b, t, h, d = q.shape
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    out = naive_attention(fold(q), fold(k), fold(v), causal=causal)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("causal", [False, True])
def test_flash2_forward_and_grads(causal):
    q, k, v = _bthd()
    f2 = functools.partial(flash2_attention, causal=causal,
                           block_q=32, block_k=32)
    na = functools.partial(_naive_bthd, causal=causal)
    np.testing.assert_allclose(f2(q, k, v), na(q, k, v),
                               rtol=2e-5, atol=2e-5)
    loss = lambda f: lambda q, k, v: jnp.sum(jnp.cos(f(q, k, v)))
    g = jax.jit(jax.grad(loss(f2), argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss(na), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)


def test_flash2_grad_with_dead_tangents():
    # k, v constant: only q's tangent is live — exercises the
    # symbolic-zeros restriction the linear_call transpose demands
    q, k, v = _bthd()
    w = jax.random.normal(jax.random.key(3), (16, 16))

    def loss(f, w):
        return jnp.sum(jnp.sin(f(jnp.einsum("bthd,de->bthe", q, w), k, v)))

    g = jax.grad(functools.partial(loss, functools.partial(
        flash2_attention, block_q=32, block_k=32)))(w)
    gr = jax.grad(functools.partial(loss, functools.partial(
        _naive_bthd, causal=False)))(w)
    np.testing.assert_allclose(g, gr, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_flash2_gp_second_order(causal):
    # the GP structure through the folded core directly
    q, k, v = _qkv(t=37)
    w = jax.random.normal(jax.random.key(7), (16, 16))
    core = _make_core(causal, float(1.0 / np.sqrt(16)), 32, 32)
    na = functools.partial(naive_attention, causal=causal)
    g = jax.jit(jax.grad(lambda w: _gp_shaped(core, w, q, k, v)))(w)
    gr = jax.grad(lambda w: _gp_shaped(na, w, q, k, v))(w)
    np.testing.assert_allclose(g, gr, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash2_first_order_variant(causal):
    # the custom_vjp (Pallas-both-directions) core: forward + one grad
    q, k, v = _bthd()
    f2 = functools.partial(flash2_attention, causal=causal,
                           block_q=32, block_k=32, first_order=True)
    na = functools.partial(_naive_bthd, causal=causal)
    np.testing.assert_allclose(f2(q, k, v), na(q, k, v),
                               rtol=2e-5, atol=2e-5)
    loss = lambda f: lambda q, k, v: jnp.sum(jnp.cos(f(q, k, v)))
    g = jax.jit(jax.grad(loss(f2), argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(loss(na), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g, gr):
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)


def test_flash2_third_order_hvp():
    q, k, v = _qkv(t=21)
    w = jax.random.normal(jax.random.key(7), (16, 16))
    u = jax.random.normal(jax.random.key(8), (16, 16))
    core = _make_core(False, float(1.0 / np.sqrt(16)), 32, 32)
    h = jax.jvp(jax.grad(lambda w: _gp_shaped(core, w, q, k, v)), (w,), (u,))[1]
    hr = jax.jvp(jax.grad(
        lambda w: _gp_shaped(naive_attention, w, q, k, v)), (w,), (u,))[1]
    np.testing.assert_allclose(h, hr, rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------------------
# the critic seat: WGAN-GP parity and finite differences
# ---------------------------------------------------------------------------

def _critic(impl):
    gan = transformer_gan(feature_dim=13, layout=LAYOUT)
    return dataclasses.replace(
        gan.discriminator, hidden_dim=32, tr_blocks=2, tr_heads=2,
        conv_dim=16, conv_layers=1, attn_impl=impl,
    )


def _gp_loss(disc, params, poses, feats):
    def scores(x):
        return jnp.sum(disc.apply(params, x, feats))

    g = jax.grad(scores)(poses)
    sq = jnp.sum(g * g, axis=tuple(range(1, g.ndim)))
    norms = jnp.sqrt(sq + 1e-12)
    return jnp.mean((norms - 1.0) ** 2)


def test_critic_gp_flash2_matches_xla():
    b, t = 2, 20
    poses = jax.random.normal(jax.random.key(0), (b, t, LAYOUT.pose_dim))
    feats = jax.random.normal(jax.random.key(1), (b, t, 13))
    grads, values = {}, {}
    for impl in ("xla", "flash2"):
        cfg = _critic(impl)
        disc = build_discriminator(cfg)
        params = disc.init(jax.random.key(2), poses, feats)
        values[impl] = _gp_loss(disc, params, poses, feats)
        grads[impl] = jax.grad(
            lambda p: _gp_loss(disc, p, poses, feats))(params)
    np.testing.assert_allclose(values["flash2"], values["xla"],
                               rtol=1e-4, atol=1e-5)
    flat_a = jax.tree_util.tree_leaves(grads["flash2"])
    flat_b = jax.tree_util.tree_leaves(grads["xla"])
    for a, b_ in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b_, rtol=5e-4, atol=1e-4)


def test_critic_gp_gradient_finite_difference():
    # numeric probe of d gp / d theta along a random parameter direction
    # through the flash2-routed critic (VERDICT #4 done-criterion)
    b, t = 2, 16
    poses = jax.random.normal(jax.random.key(0), (b, t, LAYOUT.pose_dim))
    feats = jax.random.normal(jax.random.key(1), (b, t, 13))
    cfg = _critic("flash2")
    disc = build_discriminator(cfg)
    params = disc.init(jax.random.key(2), poses, feats)

    def gp_of(p):
        return _gp_loss(disc, p, poses, feats)

    g = jax.grad(gp_of)(params)
    # single-leaf unit direction: a whole-tree unit-normal direction makes
    # the effective step ~sqrt(n_params) * eps, where the gp's curvature
    # dominates the central difference (measured 43% off); one normalized
    # leaf keeps the probe in the linear regime (measured < 0.1% off)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    idx = max(range(len(leaves)), key=lambda i: leaves[i].size)
    u = jax.random.normal(jax.random.key(5), leaves[idx].shape)
    u = u / jnp.sqrt(jnp.sum(u * u))
    directional = jnp.sum(jax.tree_util.tree_leaves(g)[idx] * u)
    eps = 1e-2
    plus, minus = list(leaves), list(leaves)
    plus[idx] = leaves[idx] + eps * u
    minus[idx] = leaves[idx] - eps * u
    fd = (gp_of(jax.tree_util.tree_unflatten(treedef, plus))
          - gp_of(jax.tree_util.tree_unflatten(treedef, minus))) / (2 * eps)
    np.testing.assert_allclose(directional, fd, rtol=1e-2, atol=1e-6)


def test_critic_auto_routes_flash2_at_long_t():
    # at T >= 256 the critic's 'auto' uses flash2 (chunked on CPU) and
    # stays finite under the GP's grad-of-grad without [T, T] blowup
    b, t = 1, 260
    poses = jax.random.normal(jax.random.key(0), (b, t, LAYOUT.pose_dim))
    feats = jax.random.normal(jax.random.key(1), (b, t, 13))
    cfg = _critic("auto")
    disc = build_discriminator(cfg)
    params = disc.init(jax.random.key(2), poses, feats)
    g = jax.grad(lambda p: _gp_loss(disc, p, poses, feats))(params)
    assert all(bool(jnp.isfinite(x).all())
               for x in jax.tree_util.tree_leaves(g))


def test_attn_long_ac_preset():
    from music2dance_tpu.configs import preset

    p = preset("attn_long_ac")
    assert p.gan.generator.arch == "transformer"
    assert p.gan.discriminator.arch == "transformer"
    assert p.train.clip_seconds == 30.0 and p.train.tbptt_window == 0
