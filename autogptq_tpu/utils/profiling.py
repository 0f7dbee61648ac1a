"""Profiling / tracing utilities.

The reference has no built-in tracing (ad-hoc time.time() only, SURVEY §5);
here profiling is first-class: jax.profiler trace capture (viewable in
TensorBoard/Perfetto/XProf) plus a lightweight phase timer whose report can
be logged after quantization or benchmarking.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace("/tmp/trace"): run()` then open
    the dir in TensorBoard or xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", logdir)


def annotate(name: str):
    """Named region visible in the device trace."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    with timer.phase("hessian"): ...
    timer.report() -> {"hessian": {"total_s": ..., "count": ...}, ...}
    """

    def __init__(self):
        self._acc = defaultdict(float)
        self._count = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def report(self) -> dict:
        return {
            k: {"total_s": round(v, 4), "count": self._count[k]}
            for k, v in sorted(self._acc.items(), key=lambda kv: -kv[1])
        }

    def log(self, prefix: str = "phases") -> None:
        for name, stats in self.report().items():
            logger.info("%s/%s: %.2fs (n=%d)", prefix, name, stats["total_s"], stats["count"])


__all__ = ["trace", "annotate", "PhaseTimer"]
