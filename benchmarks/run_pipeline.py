"""Input-pipeline overlap proof: training must not be input-bound.

Measures config #3 (full arch, batch 32, 6 s) steps/sec two ways, both
with per-step host dispatch (so both pay the same host->device latency):
  static   — the same device-resident batch every step
  pipeline — batches flowing through grain + DevicePrefetcher (host clip
             assembly + device MFCC extraction per step)
The ratio is the input-pipeline overhead; ~1.0 means fully overlapped
("the GAN step is never input-bound" [BASELINE]).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax

from benchmarks.harness import emit
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.pipeline import DevicePrefetcher, SyntheticClipSource, make_dataset
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import full_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step
from music2dance_tpu.utils.profiling import synchronize


def steps_per_sec(step, state, batches, n_steps=15):
    batch = next(batches)
    state, metrics = step(state, batch)  # warmup/compile
    synchronize(metrics)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, next(batches))
    synchronize(metrics)
    return n_steps / (time.perf_counter() - t0)


def main():
    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features)
    tc = TrainConfig(batch_size=32, clip_seconds=6.0)

    static = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, static)
    step = jax.jit(make_train_step(gan, tc))

    def static_iter():
        while True:
            yield static

    src = SyntheticClipSource(256, 6.0, audio, gan.generator.layout)
    ds = make_dataset(src, 32, 6.0, audio, seed=0)
    piped = DevicePrefetcher(iter(ds), audio, depth=2)

    sps_static = steps_per_sec(step, state, static_iter())
    sps_piped = steps_per_sec(step, state, piped)
    emit(
        "pipeline_overlap_config3",
        steps_per_sec_static=round(sps_static, 3),
        steps_per_sec_pipelined=round(sps_piped, 3),
        input_overhead_pct=round(100.0 * (sps_static / max(sps_piped, 1e-9) - 1.0), 1),
    )


if __name__ == "__main__":
    main()
