"""WGAN-GP objective: critic loss, generator loss, gradient penalty.

[BASELINE]: "alternating GAN train step (G loss, D loss, gradient
penalty)". The penalty is the WGAN-GP two-sided form
``lambda * E[(||grad_xhat D(xhat)||_2 - 1)^2]`` on per-sample
real/fake pose interpolates; for the conditional critic the interpolation
is over poses only (the conditioning audio is held fixed, the standard
conditional-WGAN-GP construction).

The penalty differentiates through ``jax.grad`` of the scan-based critic
(second-order autodiff through lax.scan — SURVEY.md §7 hard part #2); XLA
compiles the grad-of-grad without unrolling T.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def critic_gradient_norms(
    disc_apply: Callable[[jax.Array], jax.Array],
    x_hat: jax.Array,
) -> jax.Array:
    """Per-sample L2 norm of grad_x D(x) at ``x_hat`` [B, T, P] -> [B].

    ``sum(D)`` over the batch gives per-sample input gradients in one
    backward pass (samples don't interact inside the critic).
    """
    grads = jax.grad(lambda x: jnp.sum(disc_apply(x)))(x_hat)
    sq = jnp.sum(grads * grads, axis=tuple(range(1, grads.ndim)))
    # sqrt has an infinite derivative at 0; epsilon keeps grad-of-gp finite
    return jnp.sqrt(sq + 1e-12)


def gradient_penalty(
    disc_apply: Callable[[jax.Array], jax.Array],
    real: jax.Array,
    fake: jax.Array,
    key: Optional[jax.Array] = None,
    alpha: Optional[jax.Array] = None,
) -> jax.Array:
    """Two-sided WGAN-GP penalty on random per-sample interpolates.

    Pass either ``key`` (samples alpha ~ U[0,1] per clip) or a precomputed
    per-example ``alpha`` [B] — the train step uses the latter so data-
    parallel shards reproduce the exact single-device interpolates.
    """
    b = real.shape[0]
    if alpha is None:
        if key is None:
            raise ValueError("gradient_penalty needs key or alpha")
        alpha = jax.random.uniform(key, (b,), real.dtype)
    alpha = alpha.reshape((b,) + (1,) * (real.ndim - 1))
    x_hat = alpha * real + (1.0 - alpha) * fake
    norms = critic_gradient_norms(disc_apply, x_hat)
    return jnp.mean((norms - 1.0) ** 2)


def critic_loss(
    score_real: jax.Array,
    score_fake: jax.Array,
    gp: jax.Array,
    lambda_gp: float,
    drift_eps: float = 0.0,
) -> jax.Array:
    """E[D(fake)] - E[D(real)] + lambda*gp (+ optional drift)."""
    loss = jnp.mean(score_fake) - jnp.mean(score_real) + lambda_gp * gp
    if drift_eps:
        loss = loss + drift_eps * jnp.mean(score_real**2)
    return loss


def generator_loss(
    score_fake: jax.Array,
    fake_poses: Optional[jax.Array] = None,
    continuity_weight: float = 0.0,
) -> jax.Array:
    """-E[D(fake)] + optional temporal-smoothness auxiliary term."""
    loss = -jnp.mean(score_fake)
    if continuity_weight and fake_poses is not None:
        vel = fake_poses[:, 1:] - fake_poses[:, :-1]
        loss = loss + continuity_weight * jnp.mean(vel * vel)
    return loss


def feature_matching(real_features, fake_features) -> jax.Array:
    """MelGAN-style feature-matching auxiliary: mean L1 distance between
    the critic's intermediate activations on real vs generated poses,
    averaged over layers (PAPERS.md pattern; stabilizes the generator by
    giving it a dense feature-space target alongside the critic score).

    Inputs: equal-length lists of [B, T, C] activations from
    ``Discriminator(..., return_features=True)``. Real features should be
    ``stop_gradient``-ed by the caller (the generator must not learn to
    move the REAL embedding)."""
    assert len(real_features) == len(fake_features) and real_features
    total = 0.0
    for a, b in zip(real_features, fake_features):
        total = total + jnp.mean(
            jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))
        )
    return total / len(real_features)
