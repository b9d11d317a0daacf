"""Serving-stack benchmark: dynamic batching vs one-at-a-time decoding,
plus batched-decode batch-size scaling (MXU row occupancy).

Measures, on the flagship generator:
1. BatchingEngine throughput under 16 concurrent clients (requests/s and
   generated frames/s), coalesced vs max_batch=1. The host->device link
   on this container is ~28.5 MB/s, so song transfer dominates each
   request's wall time; the coalescing win shows up as overlapped
   transfers + one decode dispatch per batch instead of per request.
2. Raw masked decode frames/s at B = 64 / 128 / 256 (config #5's decode
   at growing batch): [B, 512] x [512, 1536] per-timestep matmuls fill
   25% / 50% / 100% of the MXU's 128 rows — the scaling curve IS the
   row-occupancy story from docs/DESIGN.md §3.

Usage:
  python benchmarks/run_serving.py --part engine   # threaded engine A/B
  python benchmarks/run_serving.py --part scaling  # decode B sweep
Each part fits the shell cap on its own (compiles are slow on the
tunneled TPU); run detached for the full pair.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.harness import emit, force
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.infer import BatchingEngine, Music2DanceModel, ServingConfig
from music2dance_tpu.infer.decode import decode_poses
from music2dance_tpu.models import Generator, full_gan


def make_model(seed: int = 0) -> Music2DanceModel:
    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features)
    gen = Generator(gan.generator)
    feats = jax.random.normal(jax.random.key(0), (1, 8, audio.n_features))
    z = jax.random.normal(jax.random.key(1), (1, gan.generator.noise_dim))
    params = gen.init(jax.random.key(seed + 2), feats, z)
    return Music2DanceModel(gan, audio, params)


def run_engine(model: Music2DanceModel, song_seconds: float, n_requests: int,
               n_clients: int, max_batch: int) -> dict:
    cfg = ServingConfig(
        max_batch=max_batch, max_wait_ms=10.0,
        bucket_seconds=song_seconds, max_seconds=song_seconds,
    )
    engine = BatchingEngine(model, cfg)
    try:
        engine.warmup(lengths_seconds=[song_seconds])
        sr = model.audio.sample_rate
        rng = np.random.default_rng(0)
        waves = [
            rng.standard_normal(int(song_seconds * sr)).astype(np.float32)
            for _ in range(n_requests)
        ]
        frames_each = 1 + len(waves[0]) // model.audio.hop_length
        results = [None] * n_requests
        idx_lock = threading.Lock()
        next_idx = [0]

        def client():
            while True:
                with idx_lock:
                    i = next_idx[0]
                    if i >= n_requests:
                        return
                    next_idx[0] += 1
                results[i] = engine.submit(waves[i], seed=i)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in results:
            f.result(timeout=600)
        dt = time.perf_counter() - t0
        return {
            "requests_per_sec": round(n_requests / dt, 2),
            "frames_per_sec": round(n_requests * frames_each / dt, 1),
            "batches": engine.stats["batches"],
            "song_seconds": song_seconds,
            "n_requests": n_requests,
            "n_clients": n_clients,
            "max_batch": max_batch,
        }
    finally:
        engine.close()


def part_engine():
    model = make_model()
    coalesced = run_engine(model, song_seconds=8.0, n_requests=64,
                           n_clients=16, max_batch=16)
    emit("serving_engine_batched", **coalesced)
    serial = run_engine(model, song_seconds=8.0, n_requests=64,
                        n_clients=16, max_batch=1)
    emit("serving_engine_unbatched", **serial)
    emit(
        "serving_batching_speedup",
        speedup=round(
            coalesced["requests_per_sec"] / serial["requests_per_sec"], 2
        ),
    )


def part_scaling():
    model = make_model()
    audio, gan = model.audio, model.gan
    t = audio.num_frames(audio.num_samples(180.0))
    # B=512 at 180 s songs exceeds HBM (the hoisted [B, T, 3H] gi alone is
    # ~17 GB; measured: 29.01G needed of 15.75G) — 256 is the ceiling at
    # this song length; shorter songs can go wider
    for b in (64, 128, 256):
        feats = jax.random.normal(
            jax.random.key(3), (b, t, audio.n_features)
        )
        lengths = jnp.full((b,), t, jnp.int32)
        z = jax.random.normal(jax.random.key(4), (b, gan.generator.noise_dim))
        decode = jax.jit(
            lambda p, f, zz, l: decode_poses(
                p, gan.generator, f, None, lengths=l, z=zz
            )
        )
        force(decode(model.g_params, feats, z, lengths))  # compile
        n_reps = 5
        t0 = time.perf_counter()
        for _ in range(n_reps):
            force(decode(model.g_params, feats, z, lengths))
        dt = time.perf_counter() - t0
        emit(
            f"decode_scaling_b{b}",
            frames_per_sec=round(n_reps * b * t / dt, 1),
            batch=b, frames_per_song=int(t),
            mxu_row_fill=round(min(1.0, b / 128.0), 2),
        )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["engine", "scaling", "all"],
                    default="all")
    args = ap.parse_args()
    if args.part in ("engine", "all"):
        part_engine()
    if args.part in ("scaling", "all"):
        part_scaling()
