"""Profiling and timing hooks.

The reference has no tracing/profiling support (SURVEY.md §5 — only an
ad-hoc ``process_time`` in one example).  This module provides:

* :func:`trace` — a context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of everything dispatched inside it;
* :class:`IterationTimer` — a progress-callback wrapper that records
  per-iteration wall-clock times and energies without changing fit behavior.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Callable, List, Optional


@contextmanager
def trace(log_dir: str):
    """Capture a device trace: ``with trace('/tmp/tnmf-trace'): nmf.fit(...)``.

    View with TensorBoard's profile plugin or Perfetto.
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class IterationTimer:
    """Record per-iteration wall time and (optionally) energy via the
    progress-callback protocol.

    >>> timer = IterationTimer(record_energy=True)
    >>> nmf.fit(V, n_iterations=100, progress_callback=timer)
    >>> timer.times, timer.energies, timer.iterations_per_second

    Wraps (and preserves the abort semantics of) an inner callback if given.
    Note that installing any callback forces per-iteration dispatch; for
    pure throughput measurements prefer the callback-free fused loop and
    ``bench.py``'s end-to-end timing.
    """

    def __init__(self, inner: Optional[Callable] = None, record_energy: bool = False):
        self._inner = inner
        self._record_energy = record_energy
        self.times: List[float] = []
        self.energies: List[float] = []
        self._t0: Optional[float] = None

    def __call__(self, nmf, iteration: int) -> bool:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
        self.times.append(now - self._t0)
        if self._record_energy:
            self.energies.append(nmf._energy_function())
        if self._inner is not None:
            return bool(self._inner(nmf, iteration))
        return True

    @property
    def iterations_per_second(self) -> float:
        if len(self.times) < 2:
            return float('nan')
        import numpy as np
        return float(1.0 / np.median(np.diff(self.times)))
