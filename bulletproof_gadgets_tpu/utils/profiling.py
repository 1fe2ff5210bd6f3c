"""Tracing/profiling (SURVEY.md §5.1 — the reference has none; the TPU
framework exposes jax.profiler traces plus lightweight phase timers).

Usage:
    with trace("/tmp/bpg-trace"):        # open in TensorBoard / Perfetto
        prove(...)

    with phase_timings() as timings:
        prove(...)
    # timings: {"phase": seconds, ...}
"""
import contextlib
import time
from collections import defaultdict

_current = None


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler device trace around a block."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def phase(name: str):
    """Accumulate wall time into the active phase_timings() collector."""
    global _current
    t0 = time.time()
    try:
        yield
    finally:
        if _current is not None:
            _current[name] += time.time() - t0


@contextlib.contextmanager
def phase_timings():
    global _current
    prev = _current
    _current = defaultdict(float)
    try:
        yield _current
    finally:
        _current = prev
