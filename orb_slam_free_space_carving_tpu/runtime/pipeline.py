"""Asynchronous stage runtime: the P1-P5 thread pipeline, TPU-style.

The reference runs Tracking in the caller's thread and LocalMapping /
LoopClosing / the Modeler on their own pthreads with mutex-guarded shared
state (``src/System.cc:96-119``, SURVEY.md section 2.4 P1-P5).  Here the same
latency hiding comes from ONE worker thread that owns every map *write*:

- The tracking thread's per-frame hot path is a single device dispatch that
  only READS the shared map cell (``_map_ref[0]``, an immutable pytree
  snapshot swapped atomically) and writes tracker-private state.
- Keyframe events, mapping, loop closure, global BA and carving are enqueued
  as work items and executed in order on the worker thread — the exact
  Tracking -> LocalMapping -> LoopClosing -> Modeler queue dataflow of the
  reference, minus the per-object mutexes (functional snapshots make the
  reader side race-free by construction).
- ``is_idle`` reports whether the queue has drained — the signal the
  reference exposes as ``LocalMapping::AcceptKeyFrames`` and that the
  keyframe policy's c1b condition consumes (``Tracking.cc:1029``).

While the worker blocks on a device transfer (JAX releases the GIL), the
tracking thread keeps dispatching frames — that overlap is where the fps
goes: local BA and carving leave the per-frame critical path entirely.

``deterministic=True`` (the default, used by every test) degrades to inline
execution: submit() runs the item immediately in the caller's thread, making
the pipeline bit-reproducible.
"""

from __future__ import annotations

import queue
import threading
import traceback
from typing import Callable, Optional


class StageRunner:
    """Single worker thread executing map-mutating stage work in order.

    Two priority lanes: CRITICAL items (keyframe insertion + triangulation —
    the work the tracker's local map freshness depends on) jump ahead of
    DEFERRED items (local BA, fuse, culling, carving).  FIFO order is kept
    within each lane.  This is the queue analog of the reference's
    LocalMapping::Run scheduling, where refinement only runs when no new
    keyframe waits (``LocalMapping.cc:56-104``)."""

    CRITICAL = 0
    DEFERRED = 1

    def __init__(self, deterministic: bool = True, name: str = "mapping"):
        self.deterministic = deterministic
        self._queue: "queue.PriorityQueue[tuple]" = queue.PriorityQueue()
        self._seq = 0
        self._pending = [0, 0]              # per priority lane
        self._lock = threading.Lock()
        self._idle = threading.Event()
        self._idle.set()
        self._errors: list = []
        self._thread = None
        if not deterministic:
            self._thread = threading.Thread(
                target=self._run, name=f"osfsc-{name}", daemon=True
            )
            self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, fn: Callable, *args, priority: int = 0, **kwargs):
        """Enqueue one stage item (inline in deterministic mode)."""
        if self.deterministic:
            fn(*args, **kwargs)
            return
        pr = 1 if priority else 0
        with self._lock:
            self._pending[pr] += 1
            self._seq += 1
            seq = self._seq
            self._idle.clear()
        self._queue.put((pr, seq, fn, args, kwargs))

    def is_idle(self) -> bool:
        return self._idle.is_set()

    def backlog(self, priority: Optional[int] = None) -> int:
        """Items not yet completed (0 = idle); optionally one lane only."""
        with self._lock:
            if priority is None:
                return self._pending[0] + self._pending[1]
            return self._pending[1 if priority else 0]

    def flush(self, timeout: Optional[float] = None):
        """Block until every submitted item has executed."""
        if self.deterministic:
            return
        self._idle.wait(timeout)
        if self._errors:
            err = self._errors[0]
            raise RuntimeError(f"stage worker failed: {err}")

    def shutdown(self):
        if self._thread is not None:
            self.flush()
            self._queue.put((2, 0, None, (), {}))   # sentinel after all work
            self._thread.join(timeout=30)
            self._thread = None

    # ------------------------------------------------------------------
    def _run(self):
        while True:
            pr, _seq, fn, args, kwargs = self._queue.get()
            if fn is None:
                return
            try:
                fn(*args, **kwargs)
            except Exception:                      # pragma: no cover
                # The reference swallows CARV exceptions at every boundary
                # (SFMTranscriptInterface_Delaunay.cpp:353-356); here failures
                # are recorded and re-raised at the next flush().
                self._errors.append(traceback.format_exc())
            finally:
                with self._lock:
                    self._pending[pr] -= 1
                    if self._pending[0] + self._pending[1] == 0:
                        self._idle.set()
