"""Profiling & throughput telemetry.

The reference has only ad-hoc @time instrumentation (SURVEY.md §5); this
module provides the TPU-native equivalents: jax profiler traces, phase
timers and steps/sec counters.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def profile(logdir: str = "/tmp/isokann_profile"):
    """Capture a jax profiler trace (view with TensorBoard / xprof)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timers:
    """Named accumulating phase timers with rate reporting.

    >>> t = Timers()
    >>> with t("md", work=5000):   # 5000 walker-steps
    ...     run_md()
    >>> t.report()
    """

    def __init__(self):
        self.total = defaultdict(float)
        self.work = defaultdict(float)
        self.count = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, work: float = 0.0):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.total[name] += dt
            self.work[name] += work
            self.count[name] += 1

    def rate(self, name: str):
        t = self.total.get(name, 0.0)
        return self.work.get(name, 0.0) / t if t > 0 else float("nan")

    def report(self):
        lines = []
        for name in self.total:
            line = (f"{name}: {self.total[name]:.2f}s over "
                    f"{self.count[name]} calls")
            if self.work[name]:
                line += f", {self.rate(name):.3g} units/s"
            lines.append(line)
        return "\n".join(lines)

    def __repr__(self):
        return self.report() or "Timers()"


class ThroughputLogger:
    """Iso logger tracking training iterations/second
    (plugs into ``iso.loggers``)."""

    def __init__(self, logevery: int = 50):
        self.logevery = logevery
        self.t0 = None
        self.iters = []
        self.rates = []

    def log(self, iso):
        now = time.time()
        n = len(iso.losses)
        if self.t0 is None:
            self.t0 = now
            self._last = (now, n)
            return
        lt, ln = self._last
        if n - ln >= self.logevery:
            self.rates.append((n - ln) / (now - lt))
            self.iters.append(n)
            self._last = (now, n)

    def diagnostic(self):
        return ("iters/s", round(self.rates[-1], 1) if self.rates else None)
