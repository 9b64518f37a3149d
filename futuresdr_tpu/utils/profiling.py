"""Profiling helpers (parity: the reference's samply/LTTng workflow,
``book/src/performance_measurement.md`` + ``perf/perf/src/lttng_sink.rs`` —
on TPU the native equivalent is ``jax.profiler`` Perfetto traces)."""

from __future__ import annotations

import contextlib
from pathlib import Path


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/futuresdr_tpu_trace"):
    """Capture a device+host profile viewable in Perfetto/XProf::

        with trace("/tmp/mytrace"):
            Runtime().run(fg)
    """
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
