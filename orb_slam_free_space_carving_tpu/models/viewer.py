"""Headless viewer: frame/map/model drawers + live status overlay.

TPU re-design of the Pangolin viewer stack (reference ``src/Viewer.cc:125-247``,
``src/FrameDrawer.cc:38-165``, ``src/MapDrawer.cc:44-220``,
``src/Modeler/ModelDrawer.cc:223-267``).  There is no GL context on a TPU
host, so each drawer renders into a numpy RGB image — consumable by a
notebook, an HTTP endpoint, cv2.imshow, or the PNG writer — and the
``Viewer`` loop becomes an on-demand ``render()`` call (or a background
thread at a fixed cadence, matching ``Viewer::Run``'s ~30 Hz poll).

All drawing is vectorized numpy; nothing here touches the device — inputs
are the host mirrors the pipeline already maintains.
"""

from __future__ import annotations

import threading
from typing import Optional, Tuple

import numpy as np

from orb_slam_free_space_carving_tpu.models import tracking as trk

# Palette (RGB).
_GREEN = np.array([40, 220, 60], np.uint8)     # tracked map points
_BLUE = np.array([80, 120, 255], np.uint8)     # candidate/untracked features
_RED = np.array([230, 60, 50], np.uint8)       # keyframes / lost banner
_GRAY = np.array([128, 128, 128], np.uint8)

_STATE_TEXT = {
    trk.NO_IMAGES_YET: "WAITING FOR IMAGES",
    trk.NOT_INITIALIZED: "TRYING TO INITIALIZE",
    trk.OK: "SLAM MODE",
    trk.LOST: "TRACK LOST",
}


def _stamp_squares(img: np.ndarray, uv: np.ndarray, color: np.ndarray,
                   half: int = 2):
    """Draw hollow squares at integer uv positions (FrameDrawer's
    cv::rectangle markers, ``FrameDrawer.cc:96-116``), fully vectorized:
    four 1-px edge strips per square via flat scatter."""
    h, w = img.shape[:2]
    if uv.shape[0] == 0:
        return
    u = np.round(uv[:, 0]).astype(np.int64)
    v = np.round(uv[:, 1]).astype(np.int64)
    off = np.arange(-half, half + 1)
    # Horizontal edges: (v +- half, u + off); vertical: (v + off, u +- half).
    uu = np.concatenate([
        (u[:, None] + off).ravel(), (u[:, None] + off).ravel(),
        np.repeat(u - half, off.size), np.repeat(u + half, off.size),
    ])
    vv = np.concatenate([
        np.repeat(v - half, off.size), np.repeat(v + half, off.size),
        (v[:, None] + off).ravel(), (v[:, None] + off).ravel(),
    ])
    ok = (uu >= 0) & (uu < w) & (vv >= 0) & (vv < h)
    img[vv[ok], uu[ok]] = color


class FrameDrawer:
    """Current frame + feature overlay (``FrameDrawer.cc:38-165``).

    ``update`` snapshots the tracker state after each frame (the mutex'd
    copy-in of the reference); ``draw`` renders it.  Status counters are
    encoded as a header bar: green width = tracked fraction, plus a
    state-colored banner strip (headless stand-in for cv::putText).
    """

    def __init__(self):
        self._lock = threading.Lock()
        self._img: Optional[np.ndarray] = None
        self._uv: Optional[np.ndarray] = None
        self._tracked: Optional[np.ndarray] = None
        self._state = trk.NO_IMAGES_YET
        self.n_tracked = 0
        self.n_features = 0

    def update(self, img: np.ndarray, uv: np.ndarray, valid: np.ndarray,
               track_pt: np.ndarray, state: int):
        """Copy-in of (image, undistorted uv, validity, point bindings,
        state) — called by the system after every tracked frame."""
        with self._lock:
            self._img = np.asarray(img, np.uint8).copy()
            self._uv = np.asarray(uv, np.float32)[np.asarray(valid, bool)]
            self._tracked = (
                np.asarray(track_pt)[np.asarray(valid, bool)] >= 0
            )
            self._state = int(state)
            self.n_tracked = int(self._tracked.sum())
            self.n_features = int(self._tracked.size)

    @property
    def state_text(self) -> str:
        return _STATE_TEXT.get(self._state, "?")

    def draw(self) -> Optional[np.ndarray]:
        """[H+8, W, 3] uint8: status bar + frame with feature markers."""
        with self._lock:
            if self._img is None:
                return None
            img, uv, tracked, state = (
                self._img, self._uv, self._tracked, self._state
            )
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        _stamp_squares(rgb, uv[~tracked], _BLUE)
        _stamp_squares(rgb, uv[tracked], _GREEN)
        h, w = img.shape
        bar = np.zeros((8, w, 3), np.uint8)
        bar[:4] = _GREEN if state == trk.OK else _RED
        if self.n_features:
            frac = int(w * self.n_tracked / max(self.n_features, 1))
            bar[4:, :frac] = _GREEN
        return np.concatenate([bar, rgb], axis=0)


class MapDrawer:
    """Top-down orthographic map view (``MapDrawer.cc:44-220``): map points,
    keyframe frusta footprints, current camera, spanning tree edges."""

    def __init__(self, size: int = 512, margin: float = 1.15):
        self.size = size
        self.margin = margin

    def draw(self, pt_xyz: np.ndarray, pt_valid: np.ndarray,
             kf_centers: np.ndarray, kf_valid: np.ndarray,
             cur_center: Optional[np.ndarray] = None,
             parent: Optional[np.ndarray] = None,
             axes: Tuple[int, int] = (0, 2)) -> np.ndarray:
        """[S,S,3] uint8 plan view over world axes ``axes`` (default x-z)."""
        S = self.size
        img = np.full((S, S, 3), 16, np.uint8)
        pts = pt_xyz[pt_valid][:, list(axes)] if pt_valid.any() else np.zeros((0, 2))
        kcs = kf_centers[kf_valid][:, list(axes)] if kf_valid.any() else np.zeros((0, 2))
        every = np.concatenate([pts, kcs], axis=0)
        if every.shape[0] == 0:
            return img
        lo = every.min(axis=0)
        hi = every.max(axis=0)
        c = 0.5 * (lo + hi)
        half = 0.5 * float((hi - lo).max()) * self.margin + 1e-6
        scale = (S - 1) / (2 * half)

        def to_px(xy):
            p = ((xy - (c - half)) * scale)
            return np.clip(np.round(p).astype(np.int64), 0, S - 1)

        if pts.shape[0]:
            p = to_px(pts)
            img[p[:, 1], p[:, 0]] = _GRAY
        # Spanning-tree edges (MapDrawer::DrawKeyFrames graph lines).
        if parent is not None and kf_valid.any():
            ids = np.where(kf_valid)[0]
            for i in ids:
                j = int(parent[i])
                if j < 0 or not kf_valid[j]:
                    continue
                a = to_px(kf_centers[i, list(axes)][None])[0]
                b = to_px(kf_centers[j, list(axes)][None])[0]
                n = int(max(abs(b[0] - a[0]), abs(b[1] - a[1]), 1))
                t = np.linspace(0.0, 1.0, n + 1)
                xs = np.round(a[0] + (b[0] - a[0]) * t).astype(np.int64)
                ys = np.round(a[1] + (b[1] - a[1]) * t).astype(np.int64)
                img[ys, xs] = np.array([60, 60, 160], np.uint8)
        if kcs.shape[0]:
            k = to_px(kcs)
            _stamp_squares(img, k.astype(np.float32), _RED, half=2)
        if cur_center is not None:
            cc = to_px(np.asarray(cur_center)[list(axes)][None]).astype(np.float32)
            _stamp_squares(img, cc, _GREEN, half=3)
        return img


class ModelDrawer:
    """Live double-buffered carved model (``ModelDrawer.cc:223-267``):
    the carver publishes each new mesh with ``set_model`` (back buffer);
    readers ``get_model`` the front buffer without blocking the writer —
    the reference's UpdateModel/SwitchModel dance as a lock-swap."""

    def __init__(self):
        self._lock = threading.Lock()
        self._front: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self.version = 0

    def set_model(self, vertices: np.ndarray, faces: np.ndarray):
        with self._lock:
            self._front = (vertices.copy(), faces.copy())
            self.version += 1

    def get_model(self) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        with self._lock:
            return self._front

    def draw(self, size: int = 512, axes: Tuple[int, int] = (0, 2)):
        """Wireframe plan-view render of the current mesh ([S,S,3] uint8)."""
        model = self.get_model()
        img = np.full((size, size, 3), 16, np.uint8)
        if model is None or model[0].shape[0] == 0:
            return img
        v, f = model
        p2 = v[:, list(axes)]
        lo, hi = p2.min(axis=0), p2.max(axis=0)
        c, half = 0.5 * (lo + hi), 0.5 * float((hi - lo).max()) * 1.1 + 1e-6
        px = np.clip(
            np.round((p2 - (c - half)) * (size - 1) / (2 * half)),
            0, size - 1,
        ).astype(np.int64)
        tri = px[f]                                 # [F,3,2]
        img[tri[:, :, 1].ravel(), tri[:, :, 0].ravel()] = _GREEN
        return img


class Viewer:
    """Viewer::Run analog: a background thread re-rendering every drawer at a
    fixed cadence into ``latest`` (dict of numpy images) — or call
    :meth:`render_once` for on-demand frames.  No GL, no window: downstream
    sinks (tests, PNG writers, HTTP) consume ``latest``."""

    def __init__(self, system, fps: float = 4.0, map_size: int = 512):
        # Default 4 Hz, not the reference's 30 (Viewer.cc mT=1e3/fps): every
        # render pulls device arrays (kf_pose inverse, feature uv, bindings)
        # from a background thread, and that transfer traffic competes with
        # the fused tracking dispatch on the single device queue.
        self.system = system
        self.frame_drawer = FrameDrawer()
        self.map_drawer = MapDrawer(size=map_size)
        self.model_drawer = ModelDrawer()
        self.period = 1.0 / fps
        self.latest: dict = {}
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None

    def render_once(self) -> dict:
        from orb_slam_free_space_carving_tpu.utils import lie

        sysm = self.system
        out = {}
        # Sample the tracker into the frame drawer at VIEWER cadence: the
        # device pulls (uv/bindings of the last frame) happen here, on the
        # viewer thread, never on the per-frame hot path.
        t = sysm.tracker
        img = getattr(sysm, "_prev_img", None)
        # Snapshot tracker fields once: the tracking thread swaps
        # last_frame/_track_pt_dev per frame, and reading each attribute
        # twice could pair a new frame with an old binding array.
        last_frame = t.last_frame
        if img is not None and last_frame is not None:
            feat = last_frame.feat
            tp = t._track_pt_dev if t._track_pt_dev is not None else t.last_track_pt
            if tp is not None:
                self.frame_drawer.update(
                    img, np.asarray(feat.uv_und), np.asarray(feat.valid),
                    np.asarray(tp), t.state,
                )
        frame = self.frame_drawer.draw()
        if frame is not None:
            out["frame"] = frame
        host = sysm.map_host
        m = sysm.map_arrays
        inv = np.asarray(lie.se3_inverse(m.kf_pose))
        cur = None
        last_frame = sysm.tracker.last_frame
        if last_frame is not None and sysm.tracker.state == trk.OK:
            cur = np.asarray(lie.se3_inverse(last_frame.pose))[4:7]
        out["map"] = self.map_drawer.draw(
            np.asarray(m.pt_xyz), host.pt_valid, inv[:, 4:7], host.kf_valid,
            cur_center=cur, parent=host.parent,
        )
        if sysm.carver is not None and sysm.carver.vertices is not None:
            self.model_drawer.set_model(sysm.carver.vertices, sysm.carver.faces)
        out["model"] = self.model_drawer.draw()
        self.latest = out
        return out

    def start(self):
        if self._thread is not None:
            return
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._run, name="osfsc-viewer", daemon=True
        )
        self._thread.start()

    def _run(self):
        import time

        while not self._stop.wait(self.period):
            try:
                self.render_once()
            except Exception:
                time.sleep(self.period)

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def save_png(self, key: str, path: str) -> bool:
        img = self.latest.get(key)
        if img is None:
            return False
        try:
            import cv2

            cv2.imwrite(path, img[:, :, ::-1])
            return True
        except Exception:
            # Minimal uncompressed PPM fallback (no cv2 dependency).
            with open(path.rsplit(".", 1)[0] + ".ppm", "wb") as f:
                f.write(b"P6\n%d %d\n255\n" % (img.shape[1], img.shape[0]))
                f.write(img.tobytes())
            return True
