"""Tracing / profiling helpers.

The reference's observability is MATLAB tic/toc and progress prints
(SURVEY.md §5.1). Here: named wall-clock phase timers plus optional
``jax.profiler`` device traces, usable from any loop or CLI:

    with phase_timer("initial fit"):
        ...
    print(phase_report())

    with device_trace("/tmp/amf-trace"):   # view in xprof/tensorboard
        run_active_pmf(...)
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator

_lock = threading.Lock()
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase_timer(name: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _totals[name] += dt
            _counts[name] += 1


def phase_report(reset: bool = False) -> str:
    with _lock:
        lines = [f"{'phase':<32} {'calls':>6} {'total s':>10} {'mean s':>10}"]
        for name in sorted(_totals, key=lambda n: -_totals[n]):
            t, c = _totals[name], _counts[name]
            lines.append(f"{name:<32} {c:>6} {t:>10.3f} {t / c:>10.4f}")
        if reset:
            _totals.clear()
            _counts.clear()
    return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str) -> Iterator[None]:
    """jax.profiler trace around a block (open with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
