"""SFM transcript: write, parse, and replay the CARV event journal.

The reference treats its text transcript as a *replayable* journal of the
reconstruction: ``SFMTranscriptInterface_ORBSLAM`` serializes map events
(``SFMTranscriptInterface_ORBSLAM.cpp:154-419``), ``SFMTranscript`` parses the
dialect back into cumulative state (``SFMTranscript.cpp:614-834``), and
``SFMTranscriptInterface_Delaunay::loadTranscriptFromFile`` + ``runFull`` /
``runOnlyFinalState`` re-run the carving from it
(``SFMTranscriptInterface_Delaunay.cpp:161-228``).  This module is all three:

- :func:`write_transcript` — journal -> text in the reference command
  vocabulary (``new cam: ... { new point / vis-list }``, ``del point``,
  ``del observation``, ``bundle { move point / move cam }``, ``reset``).
  Keyframes are referenced by sequential *cam index* in order of appearance,
  exactly like the reference's pointer->index maps
  (``SFMTranscriptInterface_ORBSLAM.cpp:33-59`` m_mapCamHandleToIdx).
- :func:`parse_transcript` — text -> :class:`TranscriptState` cumulative
  state (points, cam centers, visibility pairs), honoring deletion and move
  semantics (the ``stepTranscriptBody`` analog).
- :func:`replay_mesh` — final state -> carved mesh via the same kernels the
  live pipeline uses (the ``runOnlyFinalState`` analog; because the TPU
  carver recomputes from the full current constraint set, replaying entries
  one-by-one and replaying the final state produce the same mesh by
  construction).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from orb_slam_free_space_carving_tpu.models.carver import carve_mesh


# ---------------------------------------------------------------------------
# Writer (SFMTranscriptInterface_ORBSLAM)
# ---------------------------------------------------------------------------

def write_transcript(journal, path: str):
    """Serialize the event journal in the reference transcript dialect.

    Cam references (``del observation``, ``move cam``) use the sequential
    index of the cam's ``new cam`` entry, as in the reference's
    handle->index maps — keyframe *slot* ids (which may be reused after
    culling) never appear in the transcript.
    """
    cam_index: Dict[int, int] = {}      # kf slot -> transcript cam index
    with open(path, "w") as f:
        for ev in journal:
            if ev.kind == "reset":
                f.write("reset\n")
                cam_index.clear()
            elif ev.kind == "keyframe":
                cam_index[int(ev.kf)] = len(cam_index)
                c = ev.cam_center
                f.write(f"new cam: [{c[0]:.6f}; {c[1]:.6f}; {c[2]:.6f}] {{\n")
                if ev.new_points is not None:
                    for pid, p in zip(ev.new_point_ids, ev.new_points):
                        f.write(
                            f" new point: {pid} [{p[0]:.6f}; {p[1]:.6f}; {p[2]:.6f}]\n"
                        )
                if ev.vis_ids is not None:
                    ids = " ".join(str(int(i)) for i in ev.vis_ids)
                    f.write(f" vis-list: {ids}\n")
                f.write("}\n")
            elif ev.kind == "del_point":
                f.write(f"del point: {ev.point_id}\n")
            elif ev.kind == "del_obs":
                ci = cam_index.get(int(ev.kf), -1)
                if ci >= 0:
                    f.write(f"del observation: {ci}, {ev.point_id}\n")
            elif ev.kind == "adjust":
                f.write("bundle {\n")
                if ev.moved_ids is not None:
                    for pid, p in zip(ev.moved_ids, ev.moved_xyz):
                        f.write(
                            f" move point: {pid} [{p[0]:.6f}; {p[1]:.6f}; {p[2]:.6f}]\n"
                        )
                if ev.moved_kfs is not None:
                    for k, c in zip(ev.moved_kfs, ev.moved_centers):
                        ci = cam_index.get(int(k), -1)
                        if ci >= 0:
                            f.write(
                                f" move cam: {ci} [{c[0]:.6f}; {c[1]:.6f}; {c[2]:.6f}]\n"
                            )
                f.write("}\n")


# ---------------------------------------------------------------------------
# Parser (SFMTranscript::stepTranscriptBody)
# ---------------------------------------------------------------------------

_VEC = r"\[\s*([-\d.eE+]+)\s*;\s*([-\d.eE+]+)\s*;\s*([-\d.eE+]+)\s*\]"
_RE_NEW_CAM = re.compile(r"^new cam:\s*" + _VEC)
_RE_NEW_POINT = re.compile(r"^new point:\s*(\d+)\s*" + _VEC)
_RE_VIS_LIST = re.compile(r"^vis-list:\s*(.*)$")
_RE_DEL_POINT = re.compile(r"^del point:\s*(\d+)")
_RE_DEL_OBS = re.compile(r"^del observation:\s*(\d+)\s*,\s*(\d+)")
_RE_MOVE_POINT = re.compile(r"^move point:\s*(\d+)\s*" + _VEC)
_RE_MOVE_CAM = re.compile(r"^move cam:\s*(\d+)\s*" + _VEC)


@dataclass
class TranscriptState:
    """Cumulative reconstruction state (the SFMTranscript analog)."""

    cam_centers: List[np.ndarray] = field(default_factory=list)
    points: Dict[int, np.ndarray] = field(default_factory=dict)
    deleted_points: Set[int] = field(default_factory=set)
    vis: Set[Tuple[int, int]] = field(default_factory=set)  # (cam_idx, pid)
    n_resets: int = 0

    def constraints(self) -> Tuple[np.ndarray, np.ndarray]:
        """Active (origin, target) ray pairs after deletions/moves."""
        o, t = [], []
        for (ci, pid) in sorted(self.vis):
            if pid in self.deleted_points or pid not in self.points:
                continue
            o.append(self.cam_centers[ci])
            t.append(self.points[pid])
        if not o:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        return (np.stack(o).astype(np.float32),
                np.stack(t).astype(np.float32))


def parse_transcript(path: str) -> TranscriptState:
    """Parse the dialect back into cumulative state.

    Streaming, line-oriented like ``SFMTranscript::stepTranscriptBody``
    (``SFMTranscript.cpp:614-834``): ``new cam { ... }`` blocks accumulate the
    cam's new points and visibility list; deletions remove; ``bundle`` blocks
    move existing geometry; ``reset`` clears everything.
    """
    st = TranscriptState()
    cur_cam: Optional[int] = None
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line == "}":
                cur_cam = None
                continue
            if line == "reset":
                st = TranscriptState(n_resets=st.n_resets + 1)
                cur_cam = None
                continue
            if line == "bundle {":
                cur_cam = None
                continue
            m = _RE_NEW_CAM.match(line)
            if m:
                st.cam_centers.append(
                    np.array([float(m[1]), float(m[2]), float(m[3])]))
                cur_cam = len(st.cam_centers) - 1
                continue
            m = _RE_NEW_POINT.match(line)
            if m:
                st.points[int(m[1])] = np.array(
                    [float(m[2]), float(m[3]), float(m[4])])
                continue
            m = _RE_VIS_LIST.match(line)
            if m:
                if cur_cam is not None:
                    for tok in m[1].split():
                        st.vis.add((cur_cam, int(tok)))
                continue
            m = _RE_DEL_POINT.match(line)
            if m:
                st.deleted_points.add(int(m[1]))
                continue
            m = _RE_DEL_OBS.match(line)
            if m:
                st.vis.discard((int(m[1]), int(m[2])))
                continue
            m = _RE_MOVE_POINT.match(line)
            if m:
                pid = int(m[1])
                if pid in st.points:
                    st.points[pid] = np.array(
                        [float(m[2]), float(m[3]), float(m[4])])
                continue
            m = _RE_MOVE_CAM.match(line)
            if m:
                ci = int(m[1])
                if 0 <= ci < len(st.cam_centers):
                    st.cam_centers[ci] = np.array(
                        [float(m[2]), float(m[3]), float(m[4])])
                continue
            raise ValueError(f"unparseable transcript line: {line!r}")
    return st


def replay_mesh(state: TranscriptState, carving_cfg):
    """Carve the final transcript state into a mesh — the
    ``loadTranscriptFromFile`` + ``runOnlyFinalState`` +
    ``getCurrentModel`` chain (``SFMTranscriptInterface_Delaunay.cpp:
    161-228``).  Returns (vertices [V,3], faces [F,3]) or empty arrays."""
    origins, targets = state.constraints()
    out = carve_mesh(origins, targets, carving_cfg)
    if out is None:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    return out[0], out[1]
