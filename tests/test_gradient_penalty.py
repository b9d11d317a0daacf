"""Gradient-penalty correctness (SURVEY.md §4.4).

Analytic check: for a linear critic D(x) = <w, x>, the input gradient is w
everywhere, so gp == (||w|| - 1)^2 exactly. Finite-difference check: the
autodiff input gradients of the real scan-based critic match numerical
differentiation on a micro model.
"""

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.models import Discriminator, DiscriminatorConfig, JointLayout
from music2dance_tpu.train.losses import critic_gradient_norms, gradient_penalty


def test_gp_zero_iff_unit_gradient_norm():
    shape = (4, 6, 9)
    w = np.random.default_rng(0).standard_normal(shape[1:])
    w_unit = w / np.linalg.norm(w)

    for scale, expected in [(1.0, 0.0), (3.0, 4.0), (0.5, 0.25)]:
        wj = jnp.asarray(w_unit * scale)
        critic = lambda x: jnp.sum(x * wj[None], axis=(1, 2))
        real = jnp.asarray(np.random.default_rng(1).standard_normal(shape), jnp.float32)
        fake = jnp.asarray(np.random.default_rng(2).standard_normal(shape), jnp.float32)
        gp = gradient_penalty(critic, real, fake, jax.random.key(0))
        np.testing.assert_allclose(float(gp), expected, rtol=1e-5, atol=1e-6)


def test_critic_gradient_norms_match_finite_differences():
    layout = JointLayout(n_joints=2, joint_dim=3)
    cfg = DiscriminatorConfig(
        layout=layout, feature_dim=0, conditional=False,
        conv_dim=8, conv_layers=1, conv_kernel=3, hidden_dim=8, rnn_layers=1,
    )
    disc = Discriminator(cfg)
    b, t = 2, 4
    x0 = np.random.default_rng(0).standard_normal((b, t, layout.pose_dim)).astype(np.float64)
    params = disc.init(jax.random.key(0), jnp.asarray(x0, jnp.float32))

    def f(x):
        return np.asarray(
            disc.apply(params, jnp.asarray(x, jnp.float32)), dtype=np.float64
        )

    eps = 1e-3
    fd_grads = np.zeros_like(x0)
    for idx in np.ndindex(x0.shape):
        xp, xm = x0.copy(), x0.copy()
        xp[idx] += eps
        xm[idx] -= eps
        fd_grads[idx] = (f(xp)[idx[0]] - f(xm)[idx[0]]) / (2 * eps)

    ad_norms = critic_gradient_norms(
        lambda x: disc.apply(params, x), jnp.asarray(x0, jnp.float32)
    )
    fd_norms = np.sqrt((fd_grads**2).sum(axis=(1, 2)))
    np.testing.assert_allclose(np.asarray(ad_norms), fd_norms, rtol=1e-3, atol=1e-4)


def test_gp_is_differentiable_wrt_critic_params():
    """grad-of-grad through the scan-based critic compiles and is finite."""
    layout = JointLayout(n_joints=2, joint_dim=2)
    cfg = DiscriminatorConfig(
        layout=layout, feature_dim=0, conditional=False,
        conv_dim=8, conv_layers=1, hidden_dim=8, rnn_layers=1,
    )
    disc = Discriminator(cfg)
    b, t = 2, 5
    real = jax.random.normal(jax.random.key(1), (b, t, layout.pose_dim))
    fake = jax.random.normal(jax.random.key(2), (b, t, layout.pose_dim))
    params = disc.init(jax.random.key(0), real)

    @jax.jit
    def gp_grad(p):
        return jax.grad(
            lambda q: gradient_penalty(
                lambda x: disc.apply(q, x), real, fake, jax.random.key(3)
            )
        )(p)

    grads = gp_grad(params)
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
