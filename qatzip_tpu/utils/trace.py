"""Structured tracing — the XLA-native profiling leg.

Parity reference: the reference's tracing is printf-macro + per-thread
timers (SURVEY.md §5: QZ_DEBUG, g_thread.timer, dumpCounters). The
TPU-native equivalent pairs the service counters (utils/debug.py) with
real device traces: ``qz_trace`` wraps ``jax.profiler.trace`` so every
XLA dispatch inside the scope lands in a TensorBoard-loadable profile,
and ``stage`` records named host-side stage timings into the counters.

Usage::

    from qatzip_tpu.utils.trace import qz_trace, stage

    with qz_trace("/tmp/qztpu_profile"):      # device + host trace
        with stage("compress"):
            sess.compress(data)

Or set ``QZTPU_TRACE=/dir`` to trace every runtime init->close span.
"""

from __future__ import annotations

import contextlib
import os
import time

from .debug import get_counters, qz_log


@contextlib.contextmanager
def qz_trace(trace_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace (XLA device events + host annotations)
    for the enclosed scope. Viewable with TensorBoard's profile plugin."""
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    jax.profiler.start_trace(trace_dir,
                             create_perfetto_trace=False)
    t0 = time.perf_counter()
    try:
        yield trace_dir
    finally:
        jax.profiler.stop_trace()
        qz_log("trace written to %s (%.1f ms)", trace_dir,
               (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def stage(name: str):
    """Named stage timer: wall time lands in the service counters as
    ``stage_<name>_us`` (the g_thread.timer analog) and the scope is
    annotated in any active jax trace."""
    try:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # noqa: BLE001 — jax absent/old: count only
        ctx = contextlib.nullcontext()
    t0 = time.perf_counter()
    with ctx:
        try:
            yield
        finally:
            get_counters().bump(f"stage_{name}", 1,
                                0)
            get_counters().bump(f"stage_{name}_us",
                                int((time.perf_counter() - t0) * 1e6))


def maybe_trace_from_env():
    """Return a qz_trace context if QZTPU_TRACE is set, else a null one
    (used by the runtime so a whole session span can be captured without
    code changes)."""
    d = os.environ.get("QZTPU_TRACE")
    if d:
        return qz_trace(d)
    return contextlib.nullcontext()
