"""Train-step batch scaling: config #3 shapes at B = 32 / 64 / 128.

BASELINE pins the headline at batch 32, where the recurrent per-timestep
matmuls use 32-96 of the MXU's 128 rows (DESIGN.md §3: row starvation is
the measured limit). This script quantifies what a deployment that can
raise the batch actually buys: steps/s falls sub-linearly, so
examples/s — the number that matters for epochs/hour — rises. Run on
TPU: ``python benchmarks/run_batch_scaling.py [--dtype bfloat16]``.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from benchmarks.harness import emit, time_scan_steps
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import full_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[32, 64, 128])
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches per update (1 = one-shot step); the "
                         "accumulated update is EXACT vs one-shot "
                         "(tests/test_grad_accum.py), so rows with the same "
                         "B are directly comparable")
    args = ap.parse_args()

    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features, dtype=args.dtype)
    base = None
    for b in args.batches:
        tc = TrainConfig(batch_size=b, clip_seconds=6.0, n_critic=1,
                         grad_accum=args.grad_accum)
        batch = jax.device_put(
            synthetic_batch(jax.random.key(0), b, 6.0, audio))
        state = init_state(jax.random.key(1), gan, tc, batch)
        sps, _ = time_scan_steps(
            make_train_step(gan, tc), state, batch, n_steps=args.steps)
        eps = sps * b
        if base is None:
            base = eps
        row = dict(
            dtype=args.dtype, batch=b, grad_accum=args.grad_accum,
            train_steps_per_sec=round(sps, 2),
            examples_per_sec=round(eps, 1),
            examples_vs_b32=round(eps / base, 2),
        )
        stats = jax.local_devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            row["peak_mem_mb"] = round(stats["peak_bytes_in_use"] / 2**20, 1)
        emit(f"config3_batch{b}", **row)


if __name__ == "__main__":
    main()
