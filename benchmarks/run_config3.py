"""BASELINE config #3: full G/D architecture, batch 32, 6 s clips — the
headline steady-state training throughput (same measurement as bench.py)."""

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
    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features)
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)

    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)
    step_fn = make_train_step(gan, tc)

    sps, _ = time_scan_steps(step_fn, state, batch, n_steps=20, warmup=2)
    emit("config3_full_gan_train", steps_per_sec=round(sps, 3), batch=32, clip_seconds=6.0)


if __name__ == "__main__":
    main()
