"""Tracing / profiling utilities.

The reference's only instrumentation is manual ``std::chrono`` spans in the
driver plus dormant per-stage timers (``mono_encoder.cc:160-210``,
``Frame.cc:1094-1111``; SURVEY.md §5).  Here tracing is a first-class
subsystem:

  * ``Tracer`` — host-side named spans with accumulated count/total/max and a
    structured report (the per-stage analog of ``CalExTime``).
  * ``device_trace`` — context manager around ``jax.profiler`` so any run can
    produce a TensorBoard/XProf device trace (``trace_dir`` -> profile files).
  * spans also emit ``jax.profiler.TraceAnnotation`` so host spans line up
    with device timelines in XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class Tracer:
    """Named host spans with accumulated statistics.

    >>> tr = Tracer()
    >>> with tr.span("frame_build"):
    ...     ...
    >>> tr.report()["frame_build"]["count"]
    1
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._acc: Dict[str, list] = {}  # name -> [count, total_s, max_s]

    @contextlib.contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        import jax.profiler

        t0 = time.perf_counter()
        with jax.profiler.TraceAnnotation(name):
            yield
        dt = time.perf_counter() - t0
        a = self._acc.setdefault(name, [0, 0.0, 0.0])
        a[0] += 1
        a[1] += dt
        a[2] = max(a[2], dt)

    def report(self) -> Dict[str, dict]:
        return {
            k: {"count": c, "total_s": t, "mean_s": t / max(c, 1), "max_s": mx}
            for k, (c, t, mx) in sorted(self._acc.items())
        }

    def reset(self):
        self._acc.clear()


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """Capture a jax.profiler device trace into ``trace_dir`` (no-op if None)."""
    if not trace_dir:
        yield
        return
    import jax.profiler

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
