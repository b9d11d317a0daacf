"""Structured metrics logging (JSONL + stdout), replacing the reference's
loss prints / TensorBoard scalars (SURVEY.md §5 observability row; §2 C10
names TensorBoard — available as an opt-in sink alongside the JSONL)."""

from __future__ import annotations

import json
import os
import sys
import time
import warnings
from typing import Optional, TextIO


class MetricsLogger:
    """Appends one JSON line per log call; tracks steps/sec between calls.

    The emitted counters match the BASELINE metric definitions
    (steps/sec for training, frames/sec for inference) so benchmark and
    training telemetry are directly comparable.

    ``tensorboard=True`` additionally writes every scalar to a TensorBoard
    event file under ``log_dir/tb`` (tag ``{prefix}/{key}``). The JSONL
    stays the source of truth; if no TensorBoard writer is importable the
    sink is skipped with a one-time warning.
    """

    def __init__(self, log_dir: Optional[str] = None, stream: TextIO = sys.stdout,
                 tensorboard: bool = False):
        self._stream = stream
        self._file = None
        self._tb = None
        if log_dir is not None:
            os.makedirs(log_dir, exist_ok=True)
            self._file = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if tensorboard:
            if log_dir is None:
                raise ValueError("tensorboard=True requires a log_dir")
            try:
                # torch's writer: the only TB writer guaranteed in this
                # image; imported lazily (torch is a heavy import)
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(log_dir, "tb"))
            except ImportError:
                warnings.warn(
                    "tensorboard requested but no writer importable "
                    "(torch.utils.tensorboard) — JSONL logging only"
                )
        self._last_step: Optional[int] = None
        self._last_time: Optional[float] = None

    def log(self, step: int, metrics: dict, prefix: str = "train") -> dict:
        now = time.time()
        record = {"step": int(step), "time": now, "prefix": prefix}
        for k, v in metrics.items():
            record[k] = float(v)
        if self._last_step is not None and step > self._last_step:
            dt = now - self._last_time
            if dt > 0:
                record["steps_per_sec"] = (step - self._last_step) / dt
        self._last_step, self._last_time = int(step), now

        line = json.dumps(record)
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k not in ("step", "time", "prefix"):
                    self._tb.add_scalar(f"{prefix}/{k}", v, int(step))
        if self._stream is not None:
            shown = {k: round(v, 5) for k, v in record.items()
                     if k not in ("time", "prefix")}
            print(f"[{prefix}] {shown}", file=self._stream)
        return record

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
