"""Tracing/profiling hooks (SURVEY.md §5): jax.profiler traces around train
steps + honest step timing on platforms where block_until_ready is lazy."""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard/Perfetto-readable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def synchronize(tree) -> float:
    """Force device completion of ``tree``; returns a scalar host fetch.

    On the tunneled axon TPU platform ``jax.block_until_ready`` returns
    immediately (see benchmarks/harness.py); summing one leaf to a host
    float is the portable, actually-blocking barrier.
    """
    leaf = jax.tree.leaves(tree)[-1]
    return float(jnp.sum(leaf))


class StepTimer:
    """Rolling steps/sec with a real synchronization point per window."""

    def __init__(self, window: int = 50):
        self._window = window
        self._count = 0
        self._t0 = None
        self.steps_per_sec = None

    def tick(self, tree=None) -> bool:
        """Count one step; at window edges, sync + update steps_per_sec."""
        if self._t0 is None:
            if tree is not None:
                synchronize(tree)
            self._t0 = time.perf_counter()
            self._count = 0
            return False
        self._count += 1
        if self._count >= self._window:
            if tree is not None:
                synchronize(tree)
            now = time.perf_counter()
            self.steps_per_sec = self._count / (now - self._t0)
            self._t0, self._count = now, 0
            return True
        return False
