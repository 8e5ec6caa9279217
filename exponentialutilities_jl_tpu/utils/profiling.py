"""Optional profiling hooks (SURVEY §5: the reference has only `verbose`
prints and stats tuples; the TPU build adds `jax.profiler` integration).

Usage:

    from exponentialutilities_jl_tpu.utils.profiling import trace, annotate

    with trace("/tmp/jax-trace"):            # view in TensorBoard/XProf
        with annotate("expv-production"):
            w = expv(t, op, b, m=30)

Both are no-ops (with a debug log) when profiling is unavailable on the
backend — e.g. some remote-PJRT transports don't support the profiler —
so library code and user scripts can leave them in unconditionally.
"""

from __future__ import annotations

import contextlib
import logging

import jax

__all__ = ["trace", "annotate"]

_log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace of the enclosed block into ``log_dir``
    (TensorBoard `profile` plugin / XProf format). Falls back to a no-op
    if the backend transport does not support profiling."""
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:                      # pragma: no cover - backend
        _log.debug("jax.profiler unavailable (%s); trace() is a no-op", e)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:              # pragma: no cover
                _log.debug("stop_trace failed: %s", e)


def annotate(name: str):
    """Named region in the profiler timeline (TraceAnnotation): wraps
    ``jax.profiler.TraceAnnotation`` with a graceful fallback."""
    try:
        return jax.profiler.TraceAnnotation(name)
    except Exception:                           # pragma: no cover
        return contextlib.nullcontext()
