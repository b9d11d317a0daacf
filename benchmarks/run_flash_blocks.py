"""Flash-attention block-size tuning at the 180 s decode shape.

run_attn_profile.py measured the stock flash kernel (all blocks 128) at
~147 ms per layer on [B=64, h=4, Tp=5504, hd=128] causal bf16 — ~13.5
TFLOP/s, ~7% of the chip. The kernel grid is (B, h, Tq/bq, Tk/bk) with
block_b=1: 128-wide tiles leave the MXU mostly idle between grid steps.
This bench times the SAME kernel at wider q/k blocks to pick the decode
path's production block sizes (models/transformer._flash_attention).

Run: python benchmarks/run_flash_blocks.py [--seconds 180 --batch 64]
Each variant is one compile (~minutes on this tunneled chip) — the
variant list is short on purpose.
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
import numpy as np

from benchmarks.harness import emit, force
from music2dance_tpu.audio import AudioConfig


def bench_variant(q, k, v, causal, bq, bk, reps=10):
    """Times the kernel at q/k blocks (bq, bk). The kernel needs T
    divisible by the block sizes, and the 128-aligned decode length
    (5504 = 128 x 43, 43 prime) admits only 128 — so each variant pads
    T up to lcm-of-blocks alignment. With ``causal`` the padded tail is
    strictly in the future of every real row, so real-row outputs are
    bit-identical across paddings (asserted by the parity check); the
    TFLOP/s figure counts only the REAL rows' work, i.e. padding
    overhead shows up as a lower effective rate, keeping variants
    comparable."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, h, t, hd = q.shape
    align = max(bq, bk, 128)
    tp = -(-t // align) * align
    pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    bq = min(bq, tp)
    bk = min(bk, tp)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    fn = jax.jit(functools.partial(
        flash_attention, causal=causal,
        sm_scale=1.0 / float(np.sqrt(hd)), block_sizes=bs))
    out = fn(qp, kp, vp)[:, :, :t]
    force(out)
    force(fn(qp, kp, vp))
    t0 = time.perf_counter()
    for _ in range(reps):
        force(fn(qp, kp, vp))
    dt = (time.perf_counter() - t0) / reps
    flops = 4 * b * h * t * t * hd * (0.5 if causal else 1.0)
    emit("flash_block_variant", block_q=bq, block_k=bk, t_padded=tp,
         ms=round(dt * 1e3, 2), tflops_per_sec=round(flops / dt / 1e12, 1))
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad", action="store_true",
                    help="training-shape fwd+bwd variants instead")
    ap.add_argument("--seconds", type=float, default=180.0)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--head_dim", type=int, default=128)
    args = ap.parse_args()
    if args.grad:
        main_grad()
        return

    audio = AudioConfig()
    t = audio.num_frames(audio.num_samples(args.seconds))
    rng = np.random.default_rng(0)
    shape = (args.batch, args.heads, t, args.head_dim)
    q, k, v = (jnp.asarray(rng.standard_normal(shape, dtype=np.float32),
                           jnp.bfloat16) for _ in range(3))

    ref = None
    best = (1e9, None)
    for bq, bk in [(128, 128), (512, 512), (256, 1024), (512, 1024)]:
        dt, out = bench_variant(q, k, v, True, bq, bk)
        if ref is None:
            ref = out
        else:
            # block sizes must not change the math
            diff = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                         - ref.astype(jnp.float32))))
            emit("flash_block_parity", block_q=bq, block_k=bk,
                 max_abs_diff=round(diff, 6))
        if dt < best[0]:
            best = (dt, (bq, bk))
    emit("flash_block_best", block_q=best[1][0], block_k=best[1][1],
         ms=round(best[0] * 1e3, 2))



def bench_grad_variant(q, k, v, causal, bq, bk, reps=10):
    """Same variant timing through jax.grad (fwd + dq/dk/dv backward) —
    decides whether the TRAINING path (attn_long G, T=905 -> pad 1024)
    should also route to wide blocks."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        flash_attention,
    )

    b, h, t, hd = q.shape
    align = max(bq, bk, 128)
    tp = -(-t // align) * align
    pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    bq = min(bq, tp)
    bk = min(bk, tp)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )

    def loss(qq, kk, vv):
        out = flash_attention(qq, kk, vv, causal=causal,
                              sm_scale=1.0 / float(np.sqrt(hd)),
                              block_sizes=bs)
        return jnp.sum(out[:, :, :t].astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    force(g(qp, kp, vp)[0])
    force(g(qp, kp, vp)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        force(g(qp, kp, vp)[0])
    dt = (time.perf_counter() - t0) / reps
    # fwd + recomputed fwd in bwd + dq + dkv ~ 3.5x fwd flops (causal)
    flops = 3.5 * 4 * b * h * t * t * hd * (0.5 if causal else 1.0)
    emit("flash_block_grad_variant", block_q=bq, block_k=bk, t_padded=tp,
         ms=round(dt * 1e3, 2), tflops_per_sec=round(flops / dt / 1e12, 1))
    return dt, g(qp, kp, vp)


def main_grad():
    """--grad mode: the attn_long training shape [16, 4, 905, 128]."""
    rng = np.random.default_rng(0)
    shape = (16, 4, 905, 128)
    q, k, v = (jnp.asarray(rng.standard_normal(shape, dtype=np.float32),
                           jnp.bfloat16) for _ in range(3))
    ref = None
    for bq, bk in [(128, 128), (512, 512)]:
        dt, grads = bench_grad_variant(q, k, v, True, bq, bk)
        if ref is None:
            ref = grads
        else:
            worst = max(
                float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                      - b.astype(jnp.float32))))
                for a, b in zip(grads, ref)
            )
            emit("flash_block_grad_parity", block_q=bq, block_k=bk,
                 max_abs_diff=round(worst, 5))


if __name__ == "__main__":
    main()
