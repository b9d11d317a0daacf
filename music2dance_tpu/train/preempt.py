"""Preemption-safe training: SIGTERM becomes checkpoint-and-return.

Managed clusters and TPU pod schedulers signal eviction with SIGTERM and
grant a short grace window before SIGKILL (SURVEY.md §5 failure-detection
row: "design checkpoint cadence so any step is resumable"). The guard
installs a handler that does nothing but set a flag; the training loops
poll the flag at their natural boundaries (a step in ``train``, a
scan-fused chunk in ``train_from_store``), write a DURABLE checkpoint
(save + wait, plus the grain data state where one exists), log a
``preempted`` row, and return the state cleanly. Re-invoking with the
same ``--ckpt_dir`` resumes at the absolute step (train/loop.py resume
semantics), so an evicted run loses at most the in-flight chunk.

Polling-at-boundaries is deliberate: the handler must not touch JAX (a
signal can land mid-dispatch, and the runtime is not reentrant), and a
boundary is the only point where ``state`` is a complete, saveable
pytree. The flag is a ``threading.Event`` so a handler delivered on the
main thread is visible to loop code running anywhere.
"""

from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Context manager: trap SIGTERM, expose it as ``.triggered``.

    Handlers are installed only on the main thread (CPython restricts
    ``signal.signal`` to it); elsewhere — e.g. a loop driven from a
    serving worker thread — the guard degrades to an always-False flag
    rather than crashing, and ``installed`` says which happened.
    Previous handlers are restored on exit, so nesting a guarded loop
    inside a larger guarded application is safe.
    """

    SIGNALS = (signal.SIGTERM,)

    def __init__(self, extra_signals: tuple = ()):
        self._flag = threading.Event()
        self._signals = tuple(self.SIGNALS) + tuple(extra_signals)
        self._prev: dict = {}
        self.installed = False

    def _handle(self, signum, frame) -> None:  # noqa: ARG002 — signal ABI
        self._flag.set()

    def install(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._handle)
            self.installed = True
        return self

    def restore(self) -> None:
        if self.installed:
            for s, prev in self._prev.items():
                signal.signal(s, prev)
            self._prev.clear()
            self.installed = False

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc) -> bool:
        self.restore()
        return False

    @property
    def triggered(self) -> bool:
        return self._flag.is_set()
