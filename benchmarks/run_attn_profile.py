"""Where does the attention family's time go? (round-5 VERDICT #4)

Two workloads, profiled op-by-op on the real chip:

- decode: the flash-path 180 s song decode (B=64, T=5401) that measured
  0.48M frames/s in round 3 — ~11% MFU against its exact FLOP count, so
  ~89% of the time is going somewhere the FLOP model doesn't see.
- train: the `attn` preset step (B=32, 6 s) at 0.32 MFU.

Method: capture a jax.profiler trace around a timed loop, parse the
trace.json.gz event stream, and aggregate device-stream op durations by
HLO op category. The output names the top time sinks so the optimization
is aimed, not guessed (same trace-guided method that bought the
recurrent family its pad-free kernel grids, DESIGN.md §4).

Run: python benchmarks/run_attn_profile.py [--workload decode|train|both]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.harness import emit, force
from music2dance_tpu.audio import AudioConfig
from music2dance_tpu.data.synthetic import synthetic_batch
from music2dance_tpu.infer.decode import decode_poses
from music2dance_tpu.models import transformer_gan
from music2dance_tpu.train import TrainConfig, init_state, make_train_step


def _categorize(name: str) -> str:
    """HLO op name -> coarse category for the time budget."""
    n = name.lower()
    if "flash" in n or "pallas" in n or "custom-call" in n:
        return "flash_kernel"
    if n.startswith("fusion") or ".fusion" in n:
        return "fusion(elementwise/other)"
    if "convolution" in n or n.startswith("conv"):
        return "conv/matmul"
    if n.startswith("dot") or "einsum" in n or "gemm" in n:
        return "matmul"
    if "transpose" in n or "copy" in n:
        return "transpose/copy"
    if "reduce" in n:
        return "reduce"
    if "cumsum" in n or "scan" in n or "while" in n:
        return "scan/cumsum"
    if "all-reduce" in n or "collective" in n:
        return "collective"
    return "other"


def profile_block(fn, label: str, reps: int = 5):
    """Trace `reps` calls of fn() and print the per-category device time."""
    trace_dir = f"/tmp/attn_profile/{label}"
    os.makedirs(trace_dir, exist_ok=True)
    fn()  # warm/compile outside the trace
    fn()
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(reps):
            fn()
    wall = (time.perf_counter() - t0) / reps

    files = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not files:
        emit(f"{label}_profile_error", note="no trace file produced")
        return wall
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # device-stream events only: find TensorFlow-op / XLA-op events with
    # device PIDs (the axon/TPU streams name their process 'TPU' or carry
    # run_id args); host python threads are excluded by duration source
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"tpu|device|/device:|xla", n, re.I)}

    cats: dict[str, float] = {}
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        # skip host-side wrappers when device pids were identified
        if not dev_pids and not name.startswith(("fusion", "dot", "conv",
                                                 "copy", "transpose",
                                                 "custom-call", "reduce",
                                                 "while", "dynamic")):
            continue
        c = _categorize(name)
        cats[c] = cats.get(c, 0.0) + ev["dur"]
        total += ev["dur"]

    rows = sorted(cats.items(), key=lambda kv: -kv[1])
    emit(f"{label}_wall_s", value=round(wall, 4))
    for c, us in rows:
        emit(f"{label}_cat", category=c, us_per_rep=round(us / reps, 1),
             pct=round(100 * us / total, 1) if total else 0.0)

    # top individual ops — the actual optimization targets
    ops: dict[str, float] = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        ops[ev.get("name", "?")] = ops.get(ev.get("name", "?"), 0.0) + ev["dur"]
    for name, us in sorted(ops.items(), key=lambda kv: -kv[1])[:12]:
        emit(f"{label}_top_op", op=name[:90], us_per_rep=round(us / reps, 1),
             pct=round(100 * us / total, 1) if total else 0.0)
    return wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="both",
                    choices=["decode", "train", "both"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--seconds", type=float, default=180.0)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()

    audio = AudioConfig()
    gan = transformer_gan(feature_dim=audio.n_features, dtype=args.dtype)

    if args.workload in ("decode", "both"):
        t = audio.num_frames(audio.num_samples(args.seconds))
        feats = jnp.asarray(np.random.default_rng(0).standard_normal(
            (args.batch, t, audio.n_features)).astype(np.float32))
        lengths = jnp.full((args.batch,), t, jnp.int32)
        sample = {"feats": np.zeros((1, 4, audio.n_features), np.float32),
                  "poses": np.zeros((1, 4, gan.generator.pose_dim), np.float32)}
        state = init_state(jax.random.key(1), gan, TrainConfig(batch_size=1),
                           sample)
        fn = jax.jit(lambda p, f, k, ln: decode_poses(
            p, gan.generator, f, k, lengths=ln))
        key = jax.random.key(2)
        wall = profile_block(
            lambda: force(fn(state.g_params, feats, key, lengths)),
            f"decode_b{args.batch}_{int(args.seconds)}s")
        emit("decode_frames_per_sec", value=round(args.batch * t / wall, 0))

    if args.workload in ("train", "both"):
        tc = TrainConfig(batch_size=32, clip_seconds=6.0, n_critic=1)
        batch = jax.device_put(synthetic_batch(jax.random.key(0), 32, 6.0,
                                               audio))
        state = init_state(jax.random.key(1), gan, tc, batch)
        step = jax.jit(make_train_step(gan, tc), donate_argnums=(0,))

        def one():
            nonlocal state
            state, metrics = step(state, batch)
            force(metrics["g_loss"])

        wall = profile_block(one, "train_b32_6s")
        emit("train_steps_per_sec", value=round(1.0 / wall, 2))


if __name__ == "__main__":
    main()
