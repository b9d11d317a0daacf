"""Config #3 (full architecture) with cell="lstm" — fused-kernel steps/s.

The reference's cell family is unknowable (SURVEY.md §2 C3: "GRU/LSTM ...
cell type [INFERRED]"), so both cells must sustain the fused-kernel
throughput story. Same methodology as bench.py (K-step lax.scan steady
state, host-fetch sync). Emits one JSON line per dtype.
"""

from __future__ import annotations

import argparse
import dataclasses
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
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features, dtype=args.dtype)
    gan = dataclasses.replace(
        gan,
        generator=dataclasses.replace(gan.generator, cell="lstm"),
        discriminator=dataclasses.replace(gan.discriminator, cell="lstm"),
    )
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)
    sps, _ = time_scan_steps(make_train_step(gan, tc), state, batch,
                             n_steps=args.steps)
    emit(f"config3_lstm_train_{args.dtype}", steps_per_sec=round(sps, 2))


if __name__ == "__main__":
    main()
