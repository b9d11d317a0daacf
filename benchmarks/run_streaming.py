"""Online-decode latency: per-chunk feed cost of the streaming session.

The offline decode benchmarks (config #5) measure throughput; a real-time
deployment cares about LATENCY — how long one audio chunk takes from
feed() to poses, and whether that keeps up with real time. Two numbers
per chunk size:

- ``ms_per_feed``: wall time of one StreamingSession.feed() at steady
  state (host-side, because dispatch latency IS the product here — a
  live stream pays it per chunk; on this tunneled host it is mostly the
  ~RTT of two jitted calls, on a normal PCIe host it is sub-ms).
- ``real_time_factor``: chunk duration / feed time (>1 = keeps up).

Prints one JSON line per chunk size. CPU- and TPU-runnable:
``env JAX_PLATFORMS=cpu python benchmarks/run_streaming.py`` for the host
path, plain for the tunneled TPU.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.infer.streaming import make_streaming_session
from music2dance_tpu.models import build_generator, full_gan, transformer_gan


def main():
    audio = AudioConfig()
    fps = audio.feature_rate
    rng = np.random.default_rng(0)

    gan = full_gan(feature_dim=audio.n_features)
    cfg = gan.generator
    feats0 = jax.random.normal(jax.random.key(0), (1, 8, cfg.feature_dim))
    z = jax.random.normal(jax.random.key(1), (1, cfg.noise_dim))
    params = build_generator(cfg).init(jax.random.key(2), feats0, z)

    # attention family (round 4): KV-cache incremental decode rides the
    # same session API — per-feed cost is one windowed block-stack call
    # against the cached K/V, not a whole-prefix re-decode
    cfg_a = transformer_gan(feature_dim=audio.n_features).generator
    z_a = jax.random.normal(jax.random.key(1), (1, cfg_a.noise_dim))
    params_a = build_generator(cfg_a).init(jax.random.key(2), feats0, z_a)

    def measure(b: int, chunk_frames: int, arch: str = "rnn") -> dict:
        c, pr = (cfg_a, params_a) if arch == "attn" else (cfg, params)
        zb = jax.random.normal(jax.random.key(1), (b, c.noise_dim))
        sess = make_streaming_session(pr, c, zb)
        chunk = rng.standard_normal(
            (b, chunk_frames, c.feature_dim)).astype(np.float32)
        for _ in range(5):  # compile + warm the steady-state program
            sess.feed(chunk)
        n = 20
        t0 = time.perf_counter()
        frames = 0
        for _ in range(n):
            frames += sess.feed(chunk).shape[1]
        dt = time.perf_counter() - t0
        assert frames == n * chunk_frames  # steady state: no held-back drift
        ms = dt / n * 1e3
        return {
            "metric": "streaming_feed_latency",
            "backend": jax.default_backend(),
            "arch": arch,
            "streams": b,
            "chunk_frames": chunk_frames,
            "chunk_ms": round(chunk_frames / fps * 1e3, 1),
            "ms_per_feed": round(ms, 3),
            "real_time_factor": round((chunk_frames / fps) / (ms / 1e3), 2),
            "stream_seconds_per_sec": round(
                b * (chunk_frames / fps) / (ms / 1e3), 1),
        }

    for chunk_frames in (3, 9, 30):  # 100 ms / 300 ms / 1 s of audio
        print(json.dumps(measure(1, chunk_frames)))
    # lockstep multi-stream scaling: the session's batch dimension IS the
    # MXU batch dimension — many concurrent live streams per chip at
    # near-constant per-feed latency (the serving-side dual of the
    # decode batch-scaling table in RESULTS.md)
    for b in (16, 64):
        print(json.dumps(measure(b, 3)))
    # attention family: KV-cache incremental decode (infer/attn_stream.py)
    for chunk_frames in (3, 30):
        print(json.dumps(measure(1, chunk_frames, arch="attn")))
    print(json.dumps(measure(16, 3, arch="attn")))


if __name__ == "__main__":
    main()
