"""Phase breakdown of the round-2 FUSED train step (config #3).

Times the fused building blocks separately so the next optimization
target is data, not guesswork. Run on TPU.
"""

from __future__ import annotations

import argparse
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
from music2dance_tpu.models import full_gan
from music2dance_tpu.ops.fused_critic import fused_critic_apply
from music2dance_tpu.ops.fused_generator import fused_apply
from music2dance_tpu.ops.fused_generator_vjp import fused_apply_diff
from music2dance_tpu.ops.fused_gp import fused_gradient_penalty
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
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features, dtype=args.dtype)
    dcfg, gcfg = gan.discriminator, gan.generator
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)
    feats, real = batch["feats"], batch["poses"]
    b = feats.shape[0]
    z = jax.random.normal(jax.random.key(2), (b, gcfg.noise_dim))
    tx = optax.adam(1e-4)

    # 1. fused G forward (critic-phase fake gen)
    def g_fwd(c):
        out = fused_apply(state.g_params, gcfg, feats + c * 1e-9, z)
        return c * 0.999 + jnp.mean(out) * 1e-20

    emit("f_g_forward", dtype=args.dtype, ms=round(time_scan(g_fwd, jnp.ones(())), 3))

    # 2. fused critic scores forward at 2B
    x_rf = jnp.concatenate([real, real], 0)
    f_rf = jnp.concatenate([feats] * 2, 0)

    def d_fwd(c):
        s = fused_critic_apply(state.d_params, dcfg, x_rf + c * 1e-9, f_rf)
        return c * 0.999 + jnp.mean(s) * 1e-20

    emit("f_d_scores_fwd_2b", dtype=args.dtype, ms=round(time_scan(d_fwd, jnp.ones(())), 3))

    # 3. GP-only gradient (the hand-derived second-order path + adam-less)
    def gp_grad(c):
        def gp_loss(p):
            return fused_gradient_penalty(p, dcfg, real + c * 1e-9, feats)

        g = jax.grad(gp_loss)(state.d_params)
        return c * 0.999 + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-20

    emit("f_gp_grad", dtype=args.dtype, ms=round(time_scan(gp_grad, jnp.ones(())), 3))

    # 4. full d update (fake gen + scores + gp + grads + adam)
    opt_d = tx.init(state.d_params)

    def d_loss(d_params, key):
        fake = jax.lax.stop_gradient(fused_apply(state.g_params, gcfg, feats, z))
        alpha = jax.random.uniform(key, (b, 1, 1))
        x_hat = alpha * real + (1 - alpha) * fake
        s = fused_critic_apply(
            d_params, dcfg, jnp.concatenate([real, fake], 0), f_rf
        )
        gp = fused_gradient_penalty(d_params, dcfg, x_hat, feats)
        return critic_loss(s[:b], s[b:], gp, 10.0, 1e-3)

    def d_update(carry):
        d_params, opt = carry
        grads = jax.grad(d_loss)(d_params, jax.random.key(0))
        upd, opt = tx.update(grads, opt, d_params)
        return (optax.apply_updates(d_params, upd), opt)

    emit("f_d_update", dtype=args.dtype,
         ms=round(time_scan(d_update, (state.d_params, opt_d)), 3))

    # 5. full g update
    opt_g = tx.init(state.g_params)

    def g_loss(g_params):
        fake = fused_apply_diff(g_params, gcfg, feats, z)
        s = fused_critic_apply(state.d_params, dcfg, fake, feats)
        return generator_loss(s, fake, 0.0)

    def g_update(carry):
        g_params, opt = carry
        grads = jax.grad(g_loss)(g_params)
        upd, opt = tx.update(grads, opt, g_params)
        return (optax.apply_updates(g_params, upd), opt)

    emit("f_g_update", dtype=args.dtype,
         ms=round(time_scan(g_update, (state.g_params, opt_g)), 3))


if __name__ == "__main__":
    main()
