"""Sweep the time-block size ``tb`` of the sequential fused kernels.

Every fused kernel walks time in blocks of ``tb`` grid steps (DMA a
[tb, ...] slab, fori_loop inside). Larger tb = fewer grid iterations
(less per-block DMA/bookkeeping) but more VMEM per block. This sweep
times the four critic-side kernels (K1 fwd, K2 reverse, K3 tangent fwd,
K4 tangent reverse) composed as the GP gradient, plus K1 alone, at each
tb, so the default is a measured choice. Run on TPU.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.harness import emit, force
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import full_gan
from music2dance_tpu.ops.fused_critic import (
    critic_scan_forward,
    extract_critic_weights,
)
from music2dance_tpu.ops.fused_gp import fused_gradient_penalty
from music2dance_tpu.train import TrainConfig, init_state


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
    ap.add_argument("--tbs", default="4,8,16,32")
    args = ap.parse_args()

    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features, dtype=args.dtype)
    dcfg = gan.discriminator
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)
    feats, real = batch["feats"], batch["poses"]
    b, t = real.shape[:2]

    params = state.d_params["params"]
    weights = extract_critic_weights(params["step"]["core"], dcfg)
    gi = jnp.zeros((t, b, 3 * dcfg.hidden_dim), jnp.float32)
    h0 = jnp.zeros((dcfg.rnn_layers, b, dcfg.hidden_dim), jnp.float32)

    for tb in [int(x) for x in args.tbs.split(",")]:
        def k1(c):
            htop, _, _, _ = critic_scan_forward(
                gi + c * 1e-9, h0, weights, dcfg, tb=tb, interpret=False
            )
            return c * 0.999 + jnp.mean(htop) * 1e-20

        emit(f"k1_fwd_tb{tb}", dtype=args.dtype, ms=round(time_scan(k1, jnp.ones(())), 3))

        def gp_grad(c):
            def gp_loss(p):
                return fused_gradient_penalty(p, dcfg, real + c * 1e-9, feats, tb=tb)

            g = jax.grad(gp_loss)(state.d_params)
            return c * 0.999 + sum(jnp.sum(x) for x in jax.tree.leaves(g)) * 1e-20

        emit(f"gp_grad_tb{tb}", dtype=args.dtype,
             ms=round(time_scan(gp_grad, jnp.ones(())), 3))


if __name__ == "__main__":
    main()
