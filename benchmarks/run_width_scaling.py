"""Train-step width scaling: flagship shapes at hidden = 512..2048.

DESIGN.md §3's limit at the flagship width is per-timestep LATENCY, not
FLOPs: a [32,512]x[512,1536] matmul uses a fraction of one MXU pass, so
the sequential scan pays the pass setup cost, not the math. This script
measures what happens as the model gets WIDER (the production scaling
direction for a quality-bound deployment): per-step FLOPs grow ~W^2
while per-step latency grows much slower until the MXU tiles saturate,
so MFU climbs. The numbers motivate the tensor-parallel path
(music2dance_tpu/parallel/tp.py): once a single chip's HBM or step-time
budget is exhausted by width, the gate matmuls shard over the ``model``
mesh axis.

Run on TPU: ``python benchmarks/run_width_scaling.py [--dtype bfloat16]``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from benchmarks.flops import step_mfu
from benchmarks.harness import emit, time_scan_steps
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import full_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step


def widen(gan, hidden: int):
    """Flagship config with the recurrent width swapped (head scales with
    the core so the head matmuls don't become the new bottleneck)."""
    import dataclasses

    g = dataclasses.replace(gan.generator, hidden_dim=hidden,
                            head_hidden=max(256, hidden // 2))
    d = dataclasses.replace(gan.discriminator, hidden_dim=hidden)
    return dataclasses.replace(gan, generator=g, discriminator=d)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--widths", type=int, nargs="+",
                    default=[512, 1024, 2048])
    args = ap.parse_args()

    audio = AudioConfig()
    base = full_gan(feature_dim=audio.n_features, dtype=args.dtype)
    tc = TrainConfig(batch_size=args.batch, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(
        synthetic_batch(jax.random.key(0), args.batch, 6.0, audio))
    t = batch["feats"].shape[1]

    from music2dance_tpu.ops.fused_generator import supports_fused

    for w in args.widths:
        gan = widen(base, w)
        state = init_state(jax.random.key(1), gan, tc, batch)
        sps, _ = time_scan_steps(
            make_train_step(gan, tc), state, batch, n_steps=args.steps)
        m = step_mfu(gan, tc, t, sps, args.dtype)
        emit(
            f"width{w}_b{args.batch}", dtype=args.dtype, hidden=w,
            fused=supports_fused(gan.generator, interpret=False),
            train_steps_per_sec=round(sps, 2),
            examples_per_sec=round(sps * args.batch, 1),
            gflops_per_step=round(m["flops_per_step"] / 1e9, 1),
            tflops_per_sec=round(m["tflops_per_sec"], 1),
            mfu=round(m["mfu"], 3),
            latency_bound_flops_fraction=round(
                m["latency_bound_flops_fraction"], 3),
        )


if __name__ == "__main__":
    main()
