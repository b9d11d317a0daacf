"""Frontend shootout: XLA matmul chain vs fused Pallas kernel bank.

Reports device-side batch-extraction throughput for both implementations
(batch 32, 6 s clips, default config) and their max deviation — the
rtol 1e-4 [BASELINE] gate at benchmark scale.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.harness import emit, force
from music2dance_tpu.audio import AudioConfig, extract_features
from music2dance_tpu.audio.pallas_frontend import extract_features_pallas
from music2dance_tpu.data.synthetic import synthetic_waveforms


def device_side_rate(fn, batch, cfg, k=30):
    """Extractions/sec with K chained calls inside one jit (no host RTT)."""

    @jax.jit
    def many(w):
        def body(carry, _):
            out = fn(w * (1.0 + carry * 1e-30), cfg)
            return carry + jnp.sum(out[:1, :1, :1]) * 1e-30, ()

        carry, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
        return carry

    force(many(batch))
    t0 = time.perf_counter()
    force(many(batch))
    dt = time.perf_counter() - t0
    return k / dt


def main():
    cfg = AudioConfig()
    batch = synthetic_waveforms(jax.random.key(0), 32, 6.0, cfg)

    a = np.asarray(extract_features(batch, cfg))
    b = np.asarray(extract_features_pallas(batch, cfg))
    max_diff = float(np.abs(a - b).max())

    xla_rate = device_side_rate(extract_features, batch, cfg)
    pallas_rate = device_side_rate(extract_features_pallas, batch, cfg)
    emit(
        "frontend_xla_vs_pallas",
        xla_batches_per_sec=round(xla_rate, 2),
        pallas_batches_per_sec=round(pallas_rate, 2),
        speedup=round(pallas_rate / xla_rate, 3),
        max_abs_diff=max_diff,
        batch=32,
        clip_seconds=6.0,
    )


if __name__ == "__main__":
    main()
