"""Profiling and numerics-debugging hooks.

The reference's observability here is a wall-clock scalar and commented-out
``tf.debugging`` hooks (main.py:38-40, vangan.py:290-292). TPU-native
equivalents:

- ``trace(profile_dir)``: a ``jax.profiler`` trace context around training
  steps (view in TensorBoard / xprof);
- ``enable_nan_debugging()``: ``jax.config.jax_debug_nans`` — every jitted
  computation re-runs un-jitted on NaN and raises at the producing op;
- ``StepTimer``: rolling per-step wall-clock with device sync.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when profile_dir is None."""
    if not profile_dir:
        yield
        return
    with jax.profiler.trace(profile_dir):
        yield


def enable_nan_debugging() -> None:
    """Fail loudly at the op producing a NaN (vangan.py:290-292 equivalent)."""
    jax.config.update("jax_debug_nans", True)


def annotate(name: str):
    """Named trace span for profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling mean step time with explicit device synchronisation."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list = []
        self._last: Optional[float] = None

    def start(self) -> None:
        self._last = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - (self._last or time.perf_counter())
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0
