"""Profiling annotations.

Counterpart of the reference's Tracy zone macros
(``ALIGATOR_TRACY_ZONE_SCOPED``, generated header; see SURVEY.md §5.1):
`jax.profiler` trace annotations that show up in xprof/TensorBoard traces.
Zero overhead when no trace is being captured.
"""

from __future__ import annotations

import contextlib
import functools

import jax


def zone(name: str):
    """Context manager marking a trace zone (Tracy ZoneScopedN equivalent)."""
    return jax.profiler.TraceAnnotation(name)


def annotate(name: str | None = None):
    """Decorator annotating a function with a named trace zone."""

    def deco(fn):
        zname = name or fn.__qualname__

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with jax.profiler.TraceAnnotation(zname):
                return fn(*args, **kwargs)

        return wrapper

    return deco


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a profiler trace around a block (view with xprof/TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
