"""Phase breakdown of config #3: critic update vs generator update,
f32 vs bf16, fused kernels vs XLA scan. Guides headline optimization.

Run on TPU: python benchmarks/run_phases.py [--dtype bfloat16] [--fused 0|1]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from benchmarks.harness import emit, force
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import Discriminator, Generator, full_gan
from music2dance_tpu.train import TrainConfig, init_state
from music2dance_tpu.train.losses import critic_loss, generator_loss


def time_scan(fn, carry, n=50, warmup=2):
    @jax.jit
    def multi(c):
        def body(c, _):
            return fn(c), ()

        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    out = multi(carry)
    force(out)
    for _ in range(warmup - 1):
        out = multi(out)
        force(out)
    t0 = time.perf_counter()
    out = multi(out)
    force(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms per iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--fused", type=int, default=1)
    args = ap.parse_args()

    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features, dtype=args.dtype)
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)

    gen = Generator(gan.generator)
    disc = Discriminator(gan.discriminator)
    tx = optax.adam(1e-4)

    from music2dance_tpu.ops.fused_generator import fused_apply, supports_fused
    from music2dance_tpu.ops.fused_generator_vjp import fused_apply_diff

    use_fused = bool(args.fused) and jax.default_backend() == "tpu" and supports_fused(
        gan.generator, interpret=False
    )

    feats, real = batch["feats"], batch["poses"]
    b = feats.shape[0]
    z = jax.random.normal(jax.random.key(2), (b, gan.generator.noise_dim))

    def g_fwd(p):
        if use_fused:
            return fused_apply(p, gan.generator, feats, z, interpret=False)
        return gen.apply(p, feats, z)

    def g_fwd_diff(p):
        if use_fused:
            return fused_apply_diff(p, gan.generator, feats, z, interpret=False)
        return gen.apply(p, feats, z)

    # 1. generator forward only (scalar carry perturbs feats to defeat CSE,
    # epsilon-weighted mean keeps the forward live against DCE)
    def g_fwd_iter(c):
        if use_fused:
            out = fused_apply(state.g_params, gan.generator, feats + c * 1e-9, z,
                              interpret=False)
        else:
            out = gen.apply(state.g_params, feats + c * 1e-9, z)
        return c * 0.999 + jnp.mean(out) * 1e-20

    ms = time_scan(g_fwd_iter, jnp.ones(()))
    emit("phase_g_forward", dtype=args.dtype, fused=use_fused, ms=round(ms, 3))

    # 2. d-phase: full critic loss grad (incl. GP second order + fake gen)
    opt_d = tx.init(state.d_params)

    def d_loss(d_params, g_params, key):
        fake = jax.lax.stop_gradient(g_fwd(g_params))
        alpha = jax.random.uniform(key, (b, 1, 1))
        x_hat = alpha * real + (1 - alpha) * fake
        x_all = jnp.concatenate([real, fake, x_hat], 0)
        f_all = jnp.concatenate([feats] * 3, 0)
        scores, pullback = jax.vjp(lambda x: disc.apply(d_params, x, f_all), x_all)
        sel = jnp.concatenate([jnp.zeros((2 * b,)), jnp.ones((b,))])
        (gx,) = pullback(sel)
        g_hat = gx[2 * b:]
        norms = jnp.sqrt(jnp.sum(g_hat ** 2, axis=(1, 2)) + 1e-12)
        gp = jnp.mean((norms - 1.0) ** 2)
        return critic_loss(scores[:b], scores[b:2 * b], gp, 10.0, 1e-3)

    def d_update(carry):
        d_params, opt = carry
        grads = jax.grad(d_loss)(d_params, state.g_params, jax.random.key(0))
        upd, opt = tx.update(grads, opt, d_params)
        return (optax.apply_updates(d_params, upd), opt)

    ms = time_scan(d_update, (state.d_params, opt_d))
    emit("phase_d_update", dtype=args.dtype, fused=use_fused, ms=round(ms, 3))

    # 3. d-forward only (3B batched critic pass)
    x_all = jnp.concatenate([real, real, real], 0)
    f_all = jnp.concatenate([feats] * 3, 0)

    def d_fwd(c):
        s = disc.apply(state.d_params, x_all + c * 1e-9, f_all)
        return c * 0.999 + jnp.mean(s) * 1e-20

    ms = time_scan(d_fwd, jnp.ones(()))
    emit("phase_d_forward3b", dtype=args.dtype, fused=use_fused, ms=round(ms, 3))

    # 4. g-phase: generator update (grad through G and D)
    opt_g = tx.init(state.g_params)

    def g_loss(g_params):
        fake = g_fwd_diff(g_params)
        s = disc.apply(state.d_params, fake, feats)
        return generator_loss(s, fake, 0.0)

    def g_update(carry):
        g_params, opt = carry
        grads = jax.grad(g_loss)(g_params)
        upd, opt = tx.update(grads, opt, g_params)
        return (optax.apply_updates(g_params, upd), opt)

    ms = time_scan(g_update, (state.g_params, opt_g))
    emit("phase_g_update", dtype=args.dtype, fused=use_fused, ms=round(ms, 3))


if __name__ == "__main__":
    main()
