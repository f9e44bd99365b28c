"""Profiling helpers: jax.profiler traces + phase wall-clock timers.

The reference has no profiling at all (SURVEY.md §5); these wrap
`jax.profiler.trace` (viewable in XProf/TensorBoard) and provide cheap
phase timers for the pipeline drivers.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace_profile(log_dir: Optional[str]):
    """Capture a device trace into log_dir when set; no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir):
        yield


class phase_timer:
    """Accumulating phase timer: `with timer("encode"): ...`;
    `timer.report()` -> {phase: seconds}."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self._current = None
        self._t0 = 0.0

    def __call__(self, name: str):
        self._current = name
        return self

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        name = self._current or "unnamed"
        self.totals[name] = (self.totals.get(name, 0.0)
                             + time.perf_counter() - self._t0)
        return False

    def report(self) -> Dict[str, float]:
        return dict(sorted(self.totals.items(), key=lambda kv: -kv[1]))
