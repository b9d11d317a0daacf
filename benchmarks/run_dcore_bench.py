"""Merged (ops/fused_dcore.py) vs unmerged critic-phase: forward and
full update timings, config #3. Run on TPU."""

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
from music2dance_tpu.ops.fused_dcore import fused_d_phase
from music2dance_tpu.ops.fused_gp import fused_gradient_penalty
from music2dance_tpu.train import TrainConfig, init_state
from music2dance_tpu.train.losses import critic_loss


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
    dcfg = gan.discriminator
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)
    feats, real = batch["feats"], batch["poses"]
    b = feats.shape[0]
    fake = jnp.roll(real, 1, axis=0)
    alpha = jax.random.uniform(jax.random.key(3), (b, 1, 1))
    x_hat = alpha * real + (1 - alpha) * fake
    tx = optax.adam(1e-4)
    opt_d = tx.init(state.d_params)

    def merged_loss(p, c):
        s_real, s_fake, gp = fused_d_phase(p, dcfg, real + c * 1e-9, fake, x_hat, feats)
        return critic_loss(s_real, s_fake, gp, 10.0, 1e-3)

    def unmerged_loss(p, c):
        x_rf = jnp.concatenate([real + c * 1e-9, fake], 0)
        f_rf = jnp.concatenate([feats] * 2, 0)
        s = fused_critic_apply(p, dcfg, x_rf, f_rf)
        gp = fused_gradient_penalty(p, dcfg, x_hat, feats)
        return critic_loss(s[:b], s[b:], gp, 10.0, 1e-3)

    for name, loss in [("merged", merged_loss), ("unmerged", unmerged_loss)]:
        def fwd(c):
            return c * 0.999 + loss(state.d_params, c) * 1e-20

        emit(f"dloss_fwd_{name}", dtype=args.dtype, ms=round(time_scan(fwd, jnp.ones(())), 3))

        def upd(carry):
            p, opt, c = carry
            g = jax.grad(loss)(p, c)
            u, opt = tx.update(g, opt, p)
            return (optax.apply_updates(p, u), opt, c * 0.999)

        emit(f"dupdate_{name}", dtype=args.dtype,
             ms=round(time_scan(upd, (state.d_params, opt_d, jnp.ones(()))), 3))


if __name__ == "__main__":
    main()
