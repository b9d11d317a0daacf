"""Time-block (tb) sweep for the fused critic kernels + GP op.

Each grid step processes tb timesteps per DMA'd block; larger tb = fewer
grid iterations (less per-block overhead), more VMEM per block.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.harness import emit, force
from music2dance_tpu.models import DiscriminatorConfig
from music2dance_tpu.ops.fused_critic import (
    critic_scan_forward,
    extract_critic_weights,
)
from music2dance_tpu.ops.fused_gp import make_scan_input_grad


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
    cfg = DiscriminatorConfig(dtype="bfloat16")
    t, b, h = 181, 32, cfg.hidden_dim
    key = jax.random.key(0)
    gi = jax.random.normal(key, (t, b, 3 * h)) * 0.3
    gcot = jax.random.normal(jax.random.key(1), (t, b, h)) * 0.1
    h0 = jnp.zeros((cfg.rnn_layers, b, h))
    ws = []
    for i in range(2):
        ws.append(jax.random.normal(jax.random.key(2 + i), (h, 3 * h)) * 0.02
                  if i == 0 else jax.random.normal(jax.random.key(9), (3 * h,)) * 0.01)
    weights = tuple(ws)

    for tb in (4, 8, 16, 32):
        def fwd(c, tb=tb):
            htop, _, _ = critic_scan_forward(gi + c * 1e-9, h0, weights, cfg, tb=tb)
            return c * 0.999 + jnp.mean(htop) * 1e-20

        emit("tb_k1_fwd", tb=tb, ms=round(time_scan(fwd, jnp.ones(())), 3))

        op = make_scan_input_grad(cfg, tb=tb)

        def gp(c, op=op):
            dgi = op(gi + c * 1e-9, gcot, weights)
            return c * 0.999 + jnp.mean(dgi) * 1e-20

        emit("tb_gp_fwd", tb=tb, ms=round(time_scan(gp, jnp.ones(())), 3))


if __name__ == "__main__":
    main()
