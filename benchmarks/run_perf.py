"""Performance preset benchmark: full generator + TCN critic (+ bf16).

Shows the framework's fast path beyond reference-architecture parity:
config #3 shapes with the scan-free critic (see configs/presets.py "perf").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax

from benchmarks.harness import emit, time_scan_steps
from music2dance_tpu.configs import preset
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import GANConfig
from music2dance_tpu.train import init_state, make_train_step


def main():
    p = preset("perf")
    batch = jax.device_put(
        synthetic_batch(jax.random.key(0), p.train.batch_size, p.train.clip_seconds, p.audio)
    )
    results = {}
    for name, gan in {
        "steps_per_sec_f32": p.gan,
        "steps_per_sec_bf16": GANConfig(
            generator=dataclasses.replace(p.gan.generator, dtype="bfloat16"),
            discriminator=dataclasses.replace(p.gan.discriminator, dtype="bfloat16"),
        ),
    }.items():
        state = init_state(jax.random.key(1), gan, p.train, batch)
        sps, _ = time_scan_steps(make_train_step(gan, p.train), state, batch, n_steps=40)
        results[name] = round(sps, 2)
    emit("perf_preset_tcn_critic", batch=p.train.batch_size,
         clip_seconds=p.train.clip_seconds, **results)


if __name__ == "__main__":
    main()
