"""Pose/mesh/status streaming + live counters.

The reference publishes the camera pose and the carved mesh over ROS topics
(``Examples/ROS/ORB_CARV_Pub/src/ros_mono.cc:80-146``: a tf transform per
tracked frame, mesh triangles as a ``visualization_msgs::Marker``).  ROS is
not part of a TPU serving stack; the same capability here is

- :class:`StreamHub` — in-process pub/sub: sinks register callbacks for
  ``pose`` / ``mesh`` / ``status`` events; publishing is a no-op when nobody
  subscribed, so the hot path never pays for an unused feature;
- :class:`TcpPublisher` — an optional localhost TCP fan-out of the same
  events as newline-delimited JSON (the transport-agnostic stand-in for the
  ROS topic); any client (plot script, rviz bridge, browser shim) can attach;
- :class:`SystemMonitor` — the live per-stage counter surface
  (``FrameDrawer::DrawTextInfo``-style observability: keyframes, points,
  queue depth, last BA ms, fps) sampled from the running system without
  touching the device.
"""

from __future__ import annotations

import json
import socket
import threading
import time
from typing import Callable, Dict, List, Optional

import numpy as np


class StreamHub:
    """Callback pub/sub for pose / mesh / status events."""

    def __init__(self):
        self._subs: Dict[str, List[Callable]] = {}
        self._lock = threading.Lock()

    def subscribe(self, topic: str, fn: Callable):
        with self._lock:
            self._subs.setdefault(topic, []).append(fn)

    def unsubscribe(self, topic: str, fn: Callable):
        with self._lock:
            if fn in self._subs.get(topic, []):
                self._subs[topic].remove(fn)

    def has_subscribers(self, topic: str) -> bool:
        return bool(self._subs.get(topic))

    def publish(self, topic: str, payload: dict):
        with self._lock:
            subs = list(self._subs.get(topic, ()))
        for fn in subs:
            try:
                fn(payload)
            except Exception:
                pass

    # Typed helpers (the ros_mono message set) --------------------------
    def publish_pose(self, timestamp: float, pose7, state: int):
        """Per-frame camera pose (the tf broadcast, ros_mono.cc:137-146)."""
        if not self.has_subscribers("pose"):
            return
        self.publish("pose", {
            "t": float(timestamp),
            "pose": np.asarray(pose7, np.float32).tolist(),
            "state": int(state),
        })

    def publish_mesh(self, vertices: np.ndarray, faces: np.ndarray,
                     version: int):
        """Carved-model update (the Marker triangle list, ros_mono.cc:80-135)."""
        if not self.has_subscribers("mesh"):
            return
        self.publish("mesh", {
            "version": int(version),
            "n_vertices": int(vertices.shape[0]),
            "n_faces": int(faces.shape[0]),
            "vertices": np.asarray(vertices, np.float32).tolist(),
            "faces": np.asarray(faces, np.int64).tolist(),
        })

    def publish_status(self, status: dict):
        if self.has_subscribers("status"):
            self.publish("status", status)


class TcpPublisher:
    """Localhost TCP fan-out: each subscribed hub event goes to every
    connected client as one JSON line ``{"topic": ..., "data": ...}``."""

    def __init__(self, hub: StreamHub, host: str = "127.0.0.1",
                 port: int = 0, topics=("pose", "mesh", "status")):
        self.hub = hub
        self._clients: List[socket.socket] = []
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._accept_thread = threading.Thread(
            target=self._accept_loop, name="osfsc-stream-accept", daemon=True
        )
        self._accept_thread.start()
        self._handlers = []
        for topic in topics:
            fn = self._make_handler(topic)
            self.hub.subscribe(topic, fn)
            self._handlers.append((topic, fn))

    def _make_handler(self, topic: str):
        def handler(payload: dict):
            line = (json.dumps({"topic": topic, "data": payload}) + "\n").encode()
            with self._lock:
                dead = []
                for c in self._clients:
                    try:
                        c.sendall(line)
                    except OSError:
                        dead.append(c)
                for c in dead:
                    self._clients.remove(c)
                    try:
                        c.close()
                    except OSError:
                        pass
        return handler

    def _accept_loop(self):
        self._srv.settimeout(0.25)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            with self._lock:
                self._clients.append(conn)

    def n_clients(self) -> int:
        with self._lock:
            return len(self._clients)

    def close(self):
        self._stop.set()
        for topic, fn in self._handlers:
            self.hub.unsubscribe(topic, fn)
        try:
            self._srv.close()
        except OSError:
            pass
        with self._lock:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()
        self._accept_thread.join(timeout=2)


class SystemMonitor:
    """Live counters over a running System — FrameDrawer::DrawTextInfo's
    "KFs / MPs / Matches / state" line plus pipeline depth and stage times
    (``FrameDrawer.cc:129-165``), sampled host-side only."""

    def __init__(self, system):
        self.system = system
        self._t0 = time.perf_counter()
        self._frames0 = 0

    def sample(self) -> dict:
        from orb_slam_free_space_carving_tpu.utils import timing

        sysm = self.system
        t = sysm.tracker
        now = time.perf_counter()
        frames = t.frame_idx + 1
        dt = max(now - self._t0, 1e-6)
        fps = (frames - self._frames0) / dt
        self._t0, self._frames0 = now, frames
        ba_ms = sysm.local_mapper.ba_times_ms
        return {
            "state": int(t.state),
            "frames": int(frames),
            "fps_since_last_sample": round(fps, 2),
            "n_keyframes": int(sysm.map_host.kf_valid.sum()),
            "n_points": int(sysm.map_host.pt_valid.sum()),
            "n_tracked": int(t.n_tracked),
            "queue_depth": int(sysm.runner.backlog()),
            "gba_queue_depth": int(sysm.gba_runner.backlog()),
            "pending_decisions": len(t._pending),
            "last_ba_ms": round(float(ba_ms[-1]), 1) if ba_ms else None,
            "n_meshes": sysm.carver.n_meshes if sysm.carver else 0,
            "n_loops": (
                sysm.loop_closer.n_loops_closed if sysm.loop_closer else 0
            ),
            "stage_times": timing.snapshot(),
        }
