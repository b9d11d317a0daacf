"""Headline benchmark: GAN train steps/sec on TPU, batch 32, 6 s clips.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric definition comes from BASELINE.json: "GAN train steps/sec at batch
32 (6 s clips)" on the full G/D architecture (config #3). One step =
n_critic(=1) critic updates + 1 generator update, jitted, steady-state.

vs_baseline: ratio against the reference-class torch CPU implementation
(benchmarks/torch_reference.py), cached in benchmarks/torch_baseline.json
— the reference publishes no numbers and its mount is empty (SURVEY.md
§0/§6), so the same architecture in the reference's framework on the
reference's hardware class is the denominator. North star: >= 10x.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(REPO, "benchmarks", "torch_baseline.json")


def measure_tpu_train_steps_per_sec(n_steps: int = 200) -> float:
    # Device-side fused steady state: K steps in one lax.scan, synchronized
    # by an actual host fetch (block_until_ready is a no-op on the tunneled
    # axon platform) — see benchmarks/harness.py. K=200 amortizes the
    # per-invocation dispatch+fetch round trip (~0.4 ms) that K=50 left in
    # the measurement (K=50: 194.5, K=200: 211.2); the production train
    # loop sustains the same steady state end-to-end (204 steps/s at
    # --log_every 500 WITH in-step sampling, 20k-step run), so the larger
    # K reports the rate the real loop actually achieves.
    sys.path.insert(0, REPO)
    from benchmarks.harness import time_scan_steps
    from music2dance_tpu.audio import AudioConfig
    from music2dance_tpu.data.synthetic import synthetic_batch
    from music2dance_tpu.models import full_gan
    from music2dance_tpu.train import TrainConfig, init_state, make_train_step

    audio = AudioConfig()
    # bf16 mixed precision is the production TPU configuration (bf16 MXU
    # compute, f32 params/losses/poses); the full fused-kernel path engages
    # automatically (generator scan + critic scan + second-order GP op).
    # f32 measures ~188 steps/s vs bf16 ~231 at the same K=200 scan.
    gan = full_gan(feature_dim=audio.n_features, dtype="bfloat16")
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)

    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)
    sps, _ = time_scan_steps(make_train_step(gan, tc), state, batch, n_steps=n_steps)
    return sps


def torch_baseline_steps_per_sec() -> float | None:
    if not os.path.exists(BASELINE_FILE):
        # measure once (slow: python-loop RNN on CPU); cached thereafter
        try:
            subprocess.run(
                [sys.executable, os.path.join(REPO, "benchmarks", "torch_reference.py"),
                 "--config", "full", "--batch", "32", "--seconds", "6", "--steps", "2"],
                check=True, timeout=3000, capture_output=True,
            )
        except Exception:
            return None
    try:
        with open(BASELINE_FILE) as f:
            return float(json.load(f)["train_steps_per_sec"])
    except Exception:
        return None


def main():
    value = measure_tpu_train_steps_per_sec()
    baseline = torch_baseline_steps_per_sec()
    vs = (value / baseline) if baseline else None

    # exact analytic FLOPs accounting -> MFU (benchmarks/flops.py): the
    # architecture is closed-form, so flops/step is counted, not estimated
    from benchmarks.flops import step_mfu
    from music2dance_tpu.audio import AudioConfig
    from music2dance_tpu.models import full_gan
    from music2dance_tpu.train import TrainConfig

    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features, dtype="bfloat16")
    tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
    t = audio.num_frames(audio.num_samples(6.0))
    m = step_mfu(gan, tc, t, value, "bfloat16")

    print(json.dumps({
        "metric": "gan_train_steps_per_sec_b32_6s",
        "value": round(value, 4),
        "unit": "steps/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "tflops_per_sec": round(m["tflops_per_sec"], 2),
        "mfu": round(m["mfu"], 4),
        "latency_bound_flops_fraction": round(
            m["latency_bound_flops_fraction"], 3),
    }))


if __name__ == "__main__":
    main()
