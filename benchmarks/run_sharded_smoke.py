"""Sharded fused-step smoke on real TPU hardware.

The CPU test suite exercises the shard_map DP path with the fused
kernels in interpret mode only; this script runs ONE sharded train step
of the full bf16 config over a mesh of all local TPU devices (1 on this
container) so the Mosaic-compiled kernels (dual generator scan, merged
critic-phase core, second-order GP kernels) are validated inside
shard_map on hardware. Prints one JSON line with the step metrics.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.models import full_gan
from music2dance_tpu.parallel import make_mesh, shard_batch, shard_train_step
from music2dance_tpu.train import TrainConfig, init_state


def main():
    n = len(jax.devices())
    audio = AudioConfig()
    gan = full_gan(feature_dim=audio.n_features, dtype="bfloat16")
    tc = TrainConfig(batch_size=32 * n, clip_seconds=6.0, n_critic=1)
    batch = jax.device_put(synthetic_batch(jax.random.key(0), 32 * n, 6.0, audio))
    state = init_state(jax.random.key(1), gan, tc, batch)
    mesh = make_mesh(n)
    step = shard_train_step(gan, tc, mesh)
    new_state, metrics = step(state, shard_batch(batch, mesh))
    vals = {k: float(jnp.mean(v)) for k, v in metrics.items()}
    ok = all(v == v for v in vals.values()) and int(new_state.step) == 1
    print(json.dumps({
        "benchmark": "sharded_fused_step_smoke", "backend": jax.default_backend(),
        "devices": n, "ok": ok, **{k: round(v, 4) for k, v in vals.items()},
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
