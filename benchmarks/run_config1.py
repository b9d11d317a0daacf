"""BASELINE config #1: single 6 s clip — feature extraction + one G forward."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from benchmarks.harness import emit, time_fn
from music2dance_tpu.audio import AudioConfig, extract_features
from music2dance_tpu.data.synthetic import synthetic_waveforms
from music2dance_tpu.models import Generator, full_gan


def main():
    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features)
    gen = Generator(gan.generator)

    wave = synthetic_waveforms(jax.random.key(0), 1, 6.0, audio)
    feats = extract_features(wave, audio)
    z = jax.random.normal(jax.random.key(1), (1, gan.generator.noise_dim))
    params = gen.init(jax.random.key(2), feats, z)

    @jax.jit
    def pipeline(wave, params, z):
        f = extract_features(wave, audio)
        return gen.apply(params, f, z)

    calls_per_sec = time_fn(pipeline, wave, params, z, n_reps=20)
    t = feats.shape[1]
    emit(
        "config1_single_clip_feature_plus_forward",
        clips_per_sec=round(calls_per_sec, 3),
        frames_per_sec=round(calls_per_sec * t, 1),
        clip_seconds=6.0,
        frames_per_clip=int(t),
    )


if __name__ == "__main__":
    main()
