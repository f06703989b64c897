"""Profiling / tracing hooks.

The reference has no tracing beyond wall-clock prints (reference
push.py:51,157-158, find_nearest.py:80,339-340).  Here: `jax.profiler`
trace contexts around labelled regions plus a step-rate meter that
reports steps/sec and images/sec — the SURVEY §5 metric contract.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(label: str, trace_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace around a region when ``trace_dir`` is set;
    otherwise a no-op annotation context."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            with jax.profiler.TraceAnnotation(label):
                yield
    else:
        with jax.profiler.TraceAnnotation(label):
            yield


class StepMeter:
    """Running steps/sec + images/sec."""

    def __init__(self, images_per_step: int):
        self.images_per_step = images_per_step
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0

    def tick(self, n: int = 1) -> None:
        self._steps += n

    def rates(self) -> Dict[str, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        sps = self._steps / dt
        return {"steps_per_sec": sps,
                "images_per_sec": sps * self.images_per_step}
