"""Tracing / profiling utilities.

The reference's observability is wall-clock stage timers persisted to the
trial CSVs (``fingerprint_time``/``query_time``/``align_time``/
``total_time``, reference ``recognizer.py:214-220,283-286,388-390``); the
API keeps that exact schema. This module adds the layer the reference
lacked: structured stage timing as a reusable object and real device
profiling via ``jax.profiler`` trace capture (view in TensorBoard or
Perfetto).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulating named stage timer with the reference's CSV fields."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def as_row(self) -> Dict[str, float]:
        row = dict(self.stages)
        row["total_time"] = self.total
        return row


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler device trace around a block.

    Usage::

        with device_trace("/tmp/sia_trace"):
            sia.recognize_samples([clip])

    No-ops cleanly if profiling is unavailable on the backend.
    """
    if log_dir is None:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
