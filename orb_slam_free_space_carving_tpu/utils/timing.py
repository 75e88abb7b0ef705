"""Lightweight per-stage wall-time accumulators (observability, VERDICT r2 #1/#10).

Always on — accumulation is two perf_counter calls and a dict add (~100 ns),
negligible next to any device dispatch.  ``snapshot()`` feeds BENCH_DETAIL's
stage breakdown and the live ``SystemMonitor`` counters.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_lock = threading.Lock()
_acc = defaultdict(float)    # label -> total seconds
_cnt = defaultdict(int)      # label -> call count


@contextmanager
def span(label: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _acc[label] += dt
            _cnt[label] += 1


def add(label: str, seconds: float):
    with _lock:
        _acc[label] += seconds
        _cnt[label] += 1


_events = defaultdict(int)   # label -> event count (no time attached)


def count(label: str, n: int = 1):
    """Count an event (e.g. a device dispatch) without timing it."""
    with _lock:
        _events[label] += n


def event_counts() -> dict:
    with _lock:
        return dict(_events)


def snapshot() -> dict:
    """{label: {"total_s": t, "calls": n, "mean_ms": m}} for every label."""
    with _lock:
        return {
            k: {
                "total_s": round(_acc[k], 4),
                "calls": _cnt[k],
                "mean_ms": round(_acc[k] / max(_cnt[k], 1) * 1e3, 3),
            }
            for k in sorted(_acc)
        }


def reset():
    with _lock:
        _acc.clear()
        _cnt.clear()
        _events.clear()
