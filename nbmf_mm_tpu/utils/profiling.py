"""Tracing / profiling hooks (SURVEY.md §5).

The reference has essentially no observability: examples wrap ``fit`` in
``time.time()`` and the solver's returned ``time_elapsed`` is hard-coded 0.0
(``_solver.py:216``).  Here:

- :func:`trace` wraps a region in a ``jax.profiler`` trace (viewable in
  TensorBoard / Perfetto);
- :func:`sweep_timer` measures *device* time per MM sweep via
  ``block_until_ready`` around a compiled sweep, amortizing dispatch;
- :func:`device_memory_stats` surfaces per-device HBM usage when the backend
  reports it.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["trace", "sweep_timer", "device_memory_stats"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Record a jax.profiler trace of the enclosed region into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sweep_timer(fn, *args, warmup: int = 2, iters: int = 10):
    """Time a compiled function's steady-state device execution.

    Returns ``(seconds_per_call, calls_per_second)``.  ``fn`` must return
    jax arrays (they are blocked on to include device time).
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt, 1.0 / dt


def device_memory_stats(device=None) -> dict:
    """Best-effort HBM stats for ``device`` (default: first device)."""
    device = device or jax.devices()[0]
    stats = getattr(device, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
