"""Shared benchmark harness for the five BASELINE.json configs.

Each run_config{N}.py script emits one JSON line with steps/sec or
frames/sec so reference-vs-build comparison is a single run once the
reference becomes obtainable (BASELINE.md).

Two platform realities shape the timing method:
- On the tunneled 'axon' TPU platform, ``jax.block_until_ready`` returns
  immediately; only a host fetch actually synchronizes. ``force()`` fetches
  a scalar reduction of an output leaf, which transitively waits for the
  whole computation that produced it.
- Per-call host->device dispatch over the tunnel has fixed latency, so
  steady-state training throughput is measured by fusing K steps into ONE
  jitted ``lax.scan`` (device-side loop, no host round trips) — which is
  also how the production train loop runs (train/loop.py).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def force(tree) -> float:
    """Host-fetch a scalar derived from ``tree`` — a real synchronization."""
    leaf = jax.tree.leaves(tree)[-1]
    return float(jnp.sum(leaf))


def time_scan_steps(step_fn, state, batch, n_steps: int = 20, warmup: int = 2):
    """Steady-state steps/sec via a device-side lax.scan of ``step_fn``.

    ``step_fn``: (state, batch) -> (state, metrics); the same batch is fed
    every step (input pipelines are benchmarked separately).
    """

    @jax.jit
    def multi(state, batch):
        def body(s, _):
            s, metrics = step_fn(s, batch)
            return s, metrics

        state, metrics = jax.lax.scan(body, state, None, length=n_steps)
        return state, jax.tree.map(lambda x: x[-1], metrics)

    w_state, metrics = multi(state, batch)  # compile + warmup
    force(metrics)
    for _ in range(warmup - 1):
        w_state, metrics = multi(w_state, batch)
        force(metrics)

    t0 = time.perf_counter()
    new_state, metrics = multi(w_state, batch)
    force(metrics)
    dt = time.perf_counter() - t0
    return n_steps / dt, new_state


def time_fn(fn, *args, n_reps: int = 10, warmup: int = 2):
    """Steady-state calls/sec for a jitted fn, synchronized per call."""
    for _ in range(warmup):
        force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n_reps):
        force(fn(*args))
    dt = time.perf_counter() - t0
    return n_reps / dt


def emit(name: str, **fields):
    print(json.dumps({"benchmark": name, "backend": jax.default_backend(), **fields}))
