"""BASELINE config #4: long-sequence training — 30 s clips, TBPTT, batch 16."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from benchmarks.harness import emit, time_scan_steps
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import full_gan
from music2dance_tpu.train import TrainConfig, init_state
from music2dance_tpu.train.tbptt import make_tbptt_train_step


def main():
    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features)

    batch = jax.device_put(synthetic_batch(jax.random.key(0), 16, 30.0, audio))
    t = batch["feats"].shape[1]
    window = 90  # 3 s windows at the 30 Hz feature rate
    t_trim = (t // window) * window
    batch = {k: v[:, :t_trim] for k, v in batch.items()}

    tc = TrainConfig(batch_size=16, clip_seconds=30.0, tbptt_window=window, n_critic=1)
    state = init_state(jax.random.key(1), gan, tc, batch)
    step_fn = make_tbptt_train_step(gan, tc)

    sps, _ = time_scan_steps(step_fn, state, batch, n_steps=5, warmup=1)
    n_windows = t_trim // window
    emit(
        "config4_tbptt_30s_train",
        steps_per_sec=round(sps, 4),
        window_updates_per_sec=round(sps * n_windows, 3),
        batch=16, clip_seconds=30.0, tbptt_window=window, windows_per_step=n_windows,
    )


if __name__ == "__main__":
    main()
