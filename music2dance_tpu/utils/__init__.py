"""Utilities: metrics logging, profiling, visualization."""

from .logging import MetricsLogger
from .profiling import StepTimer, synchronize, trace

__all__ = ["MetricsLogger", "StepTimer", "synchronize", "trace"]
