"""Carver: the incremental free-space-carving reconstruction stage.

TPU re-design of the CARV ``Modeler`` thread + transcript pipeline (reference
``src/Modeler/Modeler.cc``, ``SFMTranscriptInterface_*``): instead of a polled
text transcript feeding an incremental CGAL tetrahedrization, the carver

- reads the *current* map snapshot (keyframe poses + observation table =
  exactly the visibility constraint set the reference accumulates through
  transcript entries — inserts/deletes/moves are implicit in the snapshot);
- runs the batched ray-march vote kernel + MRF relaxation (ops/carving.py) at
  a throttled cadence (``SFMTranscriptInterface_Delaunay.cpp:404`` >=5 s; here
  every ``mesh_every_kfs`` keyframes or on demand);
- extracts the free/occupied interface as a mesh with *surface nets* on host
  (vertex per boundary cell at the evidence-weighted centroid, quads across
  boundary faces);
- writes OBJ like ``FreespaceDelaunayAlgorithm::writeObj`` (``.cc:734-762``).

The event journal (map_state.JournalEvent) is still recorded by the pipeline
and exported via :meth:`write_transcript` — the replayable checkpoint artifact
the reference's transcript provides (SURVEY.md section 5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.ops import carving
from orb_slam_free_space_carving_tpu.utils import lie


def _check_face_overflow(counts_np, cap: int) -> int:
    """Warn when the boundary-face extraction cap truncated cells: the mesh
    would silently have holes otherwise (advisor r4).  Returns total dropped."""
    dropped = int(np.maximum(counts_np.astype(np.int64) - cap, 0).sum())
    if dropped:
        import warnings

        warnings.warn(
            f"extract_face_cells cap={cap} overflowed by {dropped} faces; "
            "mesh will have holes — raise grid cap or smooth the field",
            RuntimeWarning, stacklevel=2,
        )
    return dropped


def carve_mesh(origins: np.ndarray, targets: np.ndarray, ccfg):
    """Full carve: constraint rays -> (vertices, faces, field) or None.

    The shared back half of ``Modeler``'s model recompute
    (``SFMTranscriptInterface_Delaunay::computeCurrentModel`` ``.cpp:397-414``
    -> ``FreespaceDelaunayAlgorithm::tetsToTris``), used both by the live
    :class:`Carver` and by transcript replay (models/transcript.py).
    """
    if origins.shape[0] < 50:
        return None

    # Giant-point quarantine (the reference excludes points outside a
    # robust bound from carving, SFMTranscriptInterface_Delaunay.cpp:
    # 294-329 + 416-456): percentile bounds over targets, constraints
    # whose endpoint falls outside are dropped.
    lo_p = np.percentile(targets, 2.0, axis=0)
    hi_p = np.percentile(targets, 98.0, axis=0)
    center = 0.5 * (lo_p + hi_p)
    half = 0.5 * (hi_p - lo_p) * float(ccfg.bounds_scale) + 1e-3
    lo_np = np.minimum(center - half, origins.min(axis=0) - 1e-3)
    hi_np = np.maximum(center + half, origins.max(axis=0) + 1e-3)
    keep = np.all((targets >= lo_np) & (targets <= hi_np), axis=1)
    origins, targets = origins[keep], targets[keep]
    if origins.shape[0] < 50:
        return None

    # Pad rays to a static bucket (powers of two) for jit cache reuse.
    B = 1 << int(np.ceil(np.log2(max(origins.shape[0], 1024))))
    pad = B - origins.shape[0]
    mask = np.ones(B, bool)
    if pad:
        mask[origins.shape[0]:] = False
        origins = np.pad(origins, ((0, pad), (0, 0)))
        targets = np.pad(targets, ((0, pad), (0, 0)))

    pts_all = jnp.asarray(targets)
    lo = jnp.asarray(lo_np, jnp.float32)
    hi = jnp.asarray(hi_np, jnp.float32)
    votes, evidence = carving.carve_votes_chunked(
        jnp.asarray(origins), pts_all, jnp.asarray(mask), lo, hi,
        resolution=ccfg.grid_resolution, n_samples=ccfg.ray_samples,
    )
    field = carving.mrf_relax(
        votes, evidence, lambda_smooth=ccfg.lambda_smooth,
        iterations=ccfg.mrf_iterations,
        free_threshold=ccfg.free_vote_threshold,
    )
    ev_dil = carving.dilate_evidence(evidence, radius=ccfg.evidence_dilation)
    fx, fy, fz = carving.boundary_faces(field, ev_dil)

    R = ccfg.grid_resolution
    cells, counts = carving.extract_face_cells(fx, fy, fz, cap=6 * R * R)
    cells_np, counts_np = jax.device_get((cells, counts))
    _check_face_overflow(counts_np, 6 * R * R)
    verts, faces = surface_nets_cells(
        cells_np, counts_np, R, lo_np.astype(np.float32),
        hi_np.astype(np.float32),
    )
    return verts, faces, field


def surface_nets(fx, fy, fz, field, lo, hi):
    """Grid-input wrapper around :func:`surface_nets_cells` (kept for the
    transcript/incremental paths that already hold host grids)."""
    R = field.shape[0]
    cells = [np.argwhere(g).astype(np.int32) for g in (fx, fy, fz)]
    cap = max(1, max(c.shape[0] for c in cells))
    padded = np.full((3, cap, 3), -1, np.int32)
    counts = np.zeros(3, np.int32)
    for i, c in enumerate(cells):
        padded[i, : c.shape[0]] = c
        counts[i] = c.shape[0]
    return surface_nets_cells(padded, counts, R, lo, hi)


def surface_nets_cells(cells_np, counts_np, R, lo, hi):
    """Vectorized boundary-face mesh from per-axis face-cell index lists
    ([3, cap, 3], invalid rows = -1): one quad (two triangles) per voxel
    face on the free/occupied interface; vertices at the centroid of their
    incident face centers (sub-voxel surface-nets placement, dedup via
    np.unique).

    Watertight on the interface — the voxel analog of the reference's
    "facets between kept and carved tets"
    (``tetsToTris_maxFlowSimple`` ``.cc:1617-1655``).
    """
    scale = (np.asarray(hi) - np.asarray(lo)) / R

    quads = []  # [F,4,3] corner lattice indices
    for ax in range(3):
        cells = cells_np[ax]
        cells = cells[cells[:, 0] >= 0][: int(counts_np[ax])]
        if cells.size == 0:
            continue
        t1 = (ax + 1) % 3
        t2 = (ax + 2) % 3
        e_a = np.eye(3, dtype=np.int64)[ax]
        e1 = np.eye(3, dtype=np.int64)[t1]
        e2 = np.eye(3, dtype=np.int64)[t2]
        base = cells + e_a                      # face plane corner origin
        q = np.stack(
            [base, base + e1, base + e1 + e2, base + e2], axis=1
        )
        quads.append(q)

    if not quads:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    q = np.concatenate(quads)                   # [F,4,3]
    corners = q.reshape(-1, 3)
    uniq, inv = np.unique(corners, axis=0, return_inverse=True)
    fidx = inv.reshape(-1, 4)                   # [F,4]
    # Surface-nets vertex placement: each vertex moves to the centroid of
    # its incident interface-face centers (instead of staying on the corner
    # lattice).  On a planar interface every incident face center lies ON
    # the plane, so walls come out exactly planar — halves the staircase
    # error vs the tet oracle without touching topology.
    centers = q.astype(np.float64).mean(axis=1)            # [F,3]
    acc = np.zeros((uniq.shape[0], 3), np.float64)
    cnt = np.zeros(uniq.shape[0], np.float64)
    np.add.at(acc, inv, np.repeat(centers, 4, axis=0))
    np.add.at(cnt, inv, 1.0)
    smoothed = acc / np.maximum(cnt, 1.0)[:, None]
    vertices = (smoothed.astype(np.float32) * scale + lo).astype(np.float32)
    faces = np.concatenate(
        [fidx[:, [0, 1, 2]], fidx[:, [0, 2, 3]]], axis=0
    ).astype(np.int64)
    return vertices, faces


class Carver:
    def __init__(self, cfg: SystemConfig, map_arrays_ref, map_host: ms.MapHost,
                 mesh_every_kfs: int | None = None):
        if mesh_every_kfs is None:
            mesh_every_kfs = cfg.carving.mesh_every_kfs
        self.cfg = cfg
        self._map_ref = map_arrays_ref
        self.host = map_host
        self.mesh_every_kfs = mesh_every_kfs
        self._kfs_since_mesh = 0
        self._n_kf_seen = 0
        self._last_mesh_ts = None
        self.vertices: Optional[np.ndarray] = None   # [V,3]
        self.faces: Optional[np.ndarray] = None      # [F,3] int (triangles)
        self.field: Optional[np.ndarray] = None
        self.n_meshes = 0
        # Texture queue (Modeler::AddTexture/GetTextures keeps the 10 most
        # recent keyframe images, Modeler.cc:1474-1531).
        self.max_textures = 10
        self.textures: list = []     # [(kf_slot, gray image np.uint8)]
        # Called with (vertices, faces, n_meshes) after every mesh update
        # (System wires this to the stream hub + live ModelDrawer).
        self.on_mesh = None
        # Incremental carving state (persistent device vote/evidence grids +
        # per-KF deposit snapshots; see CarvingConfig.incremental).
        self._votes = None           # [R,R,R] device
        self._evidence = None        # [R,R,R] device
        self._lo = None              # np[3] frozen grid bounds
        self._hi = None
        self._snap: dict = {}        # kf -> (origin[3], pids[M], targets[M,3])
        self.n_full_recarves = 0
        self.n_inc_updates = 0

    @property
    def m(self) -> ms.MapArrays:
        return self._map_ref[0]

    # ------------------------------------------------------------------
    def poll(self):
        """Called per frame (Modeler::Run cadence).

        Meshes when enough keyframes accumulated OR enough SEQUENCE time
        passed since the last mesh (``mesh_interval_s``, the reference's
        >=5 s isosurface recompute throttle,
        ``SFMTranscriptInterface_Delaunay.cpp:404``) — sequence timestamps,
        not wall clock, so deterministic runs stay reproducible."""
        n_kf = int(self.host.kf_valid.sum())
        if n_kf > self._n_kf_seen:
            self._kfs_since_mesh += n_kf - self._n_kf_seen
            self._n_kf_seen = n_kf
        if self._kfs_since_mesh <= 0 or n_kf < 2:
            return
        newest_ts = float(self.host.kf_timestamp[self.host.kf_valid].max())
        if self._last_mesh_ts is None:
            self._last_mesh_ts = newest_ts
        due_kfs = self._kfs_since_mesh >= self.mesh_every_kfs
        due_time = (newest_ts - self._last_mesh_ts
                    >= self.cfg.carving.mesh_interval_s)
        if due_kfs or due_time:
            self.update_mesh()
            self._kfs_since_mesh = 0
            self._last_mesh_ts = newest_ts

    def finalize(self):
        if int(self.host.kf_valid.sum()) >= 2:
            self.update_mesh()

    def on_reset(self):
        self.vertices = None
        self.faces = None
        self._kfs_since_mesh = 0
        self._n_kf_seen = 0
        self.textures = []
        self._votes = None
        self._evidence = None
        self._lo = None
        self._hi = None
        self._snap = {}

    # ------------------------------------------------------------------
    # Texture queue (TextureFrame + Modeler::AddTexture/GetTextures)
    # ------------------------------------------------------------------
    def add_texture(self, kf: int, img: np.ndarray):
        """Keep the image of a new keyframe for mesh texturing
        (Modeler::AddTexture, ``Modeler.cc:1474-1494``)."""
        self.textures.append((int(kf), np.asarray(img, np.uint8).copy()))
        if len(self.textures) > self.max_textures:
            self.textures.pop(0)

    def get_textures(self, n: int = 10):
        """Most recent n texture keyframes (Modeler::GetTextures)."""
        return self.textures[-n:]

    def _texture_uv(self, kf: int, xyz: np.ndarray):
        """Project world points into keyframe kf -> ([n,2] uv in [0,1], ok).

        The TextureFrame::GetTexCoordinate capability
        (``src/Modeler/TextureFrame.cc:9-111``): perspective projection with
        the *current* (BA-refined) keyframe pose.
        """
        cam = self.cfg.camera
        pose = self.m.kf_pose[kf]
        xc = np.asarray(lie.se3_apply(pose, jnp.asarray(xyz, jnp.float32)))
        z = np.maximum(xc[:, 2], 1e-6)
        u = cam.fx * xc[:, 0] / z + cam.cx
        v = cam.fy * xc[:, 1] / z + cam.cy
        ok = (xc[:, 2] > 0.05) & (u >= 0) & (u < cam.width) & (v >= 0) & (v < cam.height)
        return np.stack([u / cam.width, v / cam.height], axis=-1), ok

    def save_textured_obj(self, path: str):
        """Textured mesh export: OBJ + MTL + texture atlas PNG.

        Per-triangle texture selection follows ModelDrawer's textured draw
        (``ModelDrawer.cc:13-118``): each triangle takes the keyframe that
        faces it best (max cosine between the viewing ray and the camera
        axis) among those that see its centroid; UVs are projective.  The
        atlas stacks the texture keyframes vertically.
        """
        if self.vertices is None:
            self.update_mesh()
        if self.vertices is None or not len(self.textures):
            return self.save_obj(path)
        v, f = self.vertices, self.faces
        cam = self.cfg.camera
        T = len(self.textures)
        centroids = v[f].mean(axis=1)                      # [F,3]

        centers = np.asarray(lie.se3_inverse(self.m.kf_pose))[:, 4:7]
        best_score = np.full(len(f), -np.inf)
        best_tex = np.full(len(f), -1, np.int64)
        uv_per_tex = []
        for ti, (kf, _img) in enumerate(self.textures):
            uvc, okc = self._texture_uv(kf, centroids)
            # Facing score: cosine between the ray to the centroid and the
            # camera optical axis (ModelDrawer best-facing heuristic).
            ray = centroids - centers[kf]
            ray = ray / np.maximum(np.linalg.norm(ray, axis=-1, keepdims=True), 1e-9)
            Rwc = np.asarray(lie.quat_to_matrix(
                jnp.asarray(lie.se3_inverse(self.m.kf_pose[kf])[:4])
            ))
            axis = Rwc[:, 2]                                # camera +z in world
            score = ray @ axis
            score = np.where(okc, score, -np.inf)
            take = score > best_score
            best_score = np.where(take, score, best_score)
            best_tex = np.where(take, ti, best_tex)
            uvv, okv = self._texture_uv(kf, v)
            uv_per_tex.append(uvv)

        textured = best_tex >= 0
        # Atlas: stack images vertically; uv row ti occupies
        # [ti/T, (ti+1)/T] of the atlas v range (flipped for OBJ convention).
        atlas = np.concatenate([im for _, im in self.textures], axis=0)
        base = path.rsplit(".", 1)[0]
        try:
            import cv2

            cv2.imwrite(base + "_atlas.png", atlas)
        except Exception:
            pass

        with open(base + ".mtl", "w") as mf:
            mf.write("newmtl carved\nKa 1 1 1\nKd 1 1 1\n"
                     f"map_Kd {base.rsplit('/', 1)[-1]}_atlas.png\n")

        with open(path, "w") as fh:
            fh.write(f"mtllib {base.rsplit('/', 1)[-1]}.mtl\nusemtl carved\n")
            for p in v:
                fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            # One vt per (vertex, texture) pair actually used: emit per face.
            vt_idx = {}
            vt_lines = []
            face_lines = []
            for fi, tri_ in enumerate(f):
                if not textured[fi]:
                    face_lines.append(
                        f"f {tri_[0]+1} {tri_[1]+1} {tri_[2]+1}\n")
                    continue
                ti = int(best_tex[fi])
                ids = []
                for vi in tri_:
                    key = (int(vi), ti)
                    if key not in vt_idx:
                        uu, vv = uv_per_tex[ti][vi]
                        # Atlas v: texture ti occupies rows [ti, ti+1]/T,
                        # OBJ vt origin is bottom-left -> flip.
                        av = 1.0 - (ti + vv) / T
                        vt_idx[key] = len(vt_lines) + 1
                        vt_lines.append(f"vt {uu:.6f} {av:.6f}\n")
                    ids.append(vt_idx[key])
                face_lines.append(
                    f"f {tri_[0]+1}/{ids[0]} {tri_[1]+1}/{ids[1]} "
                    f"{tri_[2]+1}/{ids[2]}\n")
            fh.writelines(vt_lines)
            fh.writelines(face_lines)

    # ------------------------------------------------------------------
    def _constraints(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(origins[B,3], targets[B,3], mask[B]) from the current obs table."""
        m = self.m
        host = self.host
        K = host.n_kf_slots
        obs = host.obs_pt[:K]                      # [K,N]
        kf_ok = host.kf_valid[:K]
        ks, fs = np.where((obs >= 0) & kf_ok[:, None])
        pids = obs[ks, fs]
        live = host.pt_valid[pids]
        ks, pids = ks[live], pids[live]
        centers = np.asarray(lie.se3_inverse(m.kf_pose))[:, 4:7]
        pts = np.asarray(m.pt_xyz)
        origins = centers[ks]
        targets = pts[pids]
        cap = self.cfg.carving.max_rays_per_kf * max(int(kf_ok.sum()), 1)
        if origins.shape[0] > cap:
            sel = np.random.default_rng(0).choice(origins.shape[0], cap, replace=False)
            origins, targets = origins[sel], targets[sel]
        return origins.astype(np.float32), targets.astype(np.float32)

    def update_mesh(self):
        """Recompute vote grids from all constraints + extract the surface.

        With ``carving.use_delaunay_oracle`` the mesh instead comes from the
        host Delaunay tetrahedrization + exact min-cut (ops/delaunay.py) —
        the reference's original discretization, used as a topology oracle
        for validation on small scenes."""
        from orb_slam_free_space_carving_tpu.utils import timing

        with timing.span("worker.carve_mesh"):
            n0 = self.n_meshes
            self._update_mesh_inner()
        if self.n_meshes != n0 and self.on_mesh is not None:
            self.on_mesh(self.vertices, self.faces, self.n_meshes)

    def _update_mesh_inner(self):
        if self.cfg.carving.use_delaunay_oracle:
            origins, targets = self._constraints()
            host = self.host
            pts = np.asarray(self.m.pt_xyz)[host.pt_valid]
            if pts.shape[0] < 16 or origins.shape[0] == 0:
                return
            from orb_slam_free_space_carving_tpu.ops import delaunay

            v, f, _info = delaunay.carve_delaunay(
                pts, origins, targets,
                lambda_smooth=self.cfg.carving.lambda_smooth,
            )
            self.vertices, self.faces, self.field = v, f, None
            self.n_meshes += 1
            return
        if self.cfg.carving.incremental:
            if self._update_mesh_incremental():
                self.n_meshes += 1
            return
        origins, targets = self._constraints()
        out = carve_mesh(origins, targets, self.cfg.carving)
        if out is None:
            return
        self.vertices, self.faces, self.field = out
        self.n_meshes += 1

    # ------------------------------------------------------------------
    # Incremental re-carving (FreespaceDelaunayAlgorithm.cc:274-302 analog)
    # ------------------------------------------------------------------
    def _constraints_by_kf(self) -> dict:
        """Current constraint set grouped per keyframe:
        {kf_slot: (origin[3], pids[M], targets[M,3])}, with the per-KF ray
        cap applied deterministically (seeded by slot) so an unchanged KF
        reproduces the identical subset across updates."""
        m, host = self.m, self.host
        K = host.n_kf_slots
        obs = host.obs_pt[:K]
        kf_ok = host.kf_valid[:K]
        centers = np.asarray(lie.se3_inverse(m.kf_pose))[:, 4:7]
        pts = np.asarray(m.pt_xyz)
        cap = self.cfg.carving.max_rays_per_kf
        out = {}
        for k in np.where(kf_ok)[0]:
            pids = obs[k]
            pids = pids[pids >= 0]
            pids = pids[host.pt_valid[pids]]
            if pids.size == 0:
                continue
            pids = np.sort(pids)
            if pids.size > cap:
                sel = np.random.default_rng(int(k)).choice(
                    pids.size, cap, replace=False)
                pids = pids[np.sort(sel)]
            out[int(k)] = (
                centers[k].astype(np.float32), pids.astype(np.int64),
                pts[pids].astype(np.float32),
            )
        return out

    def _deposit(self, origins: np.ndarray, targets: np.ndarray, weight: float):
        """One batched signed carve over the frozen grid; returns device
        (votes, evidence) deltas.  Rays whose target is outside the frozen
        bounds are dropped whole (the giant-point quarantine)."""
        keep = np.all((targets >= self._lo) & (targets <= self._hi), axis=1)
        origins, targets = origins[keep], targets[keep]
        B = 1 << int(np.ceil(np.log2(max(origins.shape[0], 1024))))
        pad = B - origins.shape[0]
        mask = np.ones(B, bool)
        if pad:
            mask[origins.shape[0]:] = False
            origins = np.pad(origins, ((0, pad), (0, 0)))
            targets = np.pad(targets, ((0, pad), (0, 0)))
        ccfg = self.cfg.carving
        return carving.carve_votes_chunked(
            jnp.asarray(origins), jnp.asarray(targets), jnp.asarray(mask),
            jnp.asarray(self._lo, jnp.float32), jnp.asarray(self._hi, jnp.float32),
            resolution=ccfg.grid_resolution, n_samples=ccfg.ray_samples,
            weight=weight,
        )

    def _update_mesh_incremental(self) -> bool:
        ccfg = self.cfg.carving
        cur = self._constraints_by_kf()
        n_rays = sum(v[2].shape[0] for v in cur.values())
        if n_rays < 50:
            return False

        full = self._lo is None
        changed, removed = [], []
        if not full:
            tol = (ccfg.incremental_tol_voxels
                   * float((self._hi - self._lo).max()) / ccfg.grid_resolution)
            for k, (o, pids, tg) in cur.items():
                old = self._snap.get(k)
                if old is None:
                    changed.append(k)
                elif (old[1].shape != pids.shape or (old[1] != pids).any()
                      or np.abs(old[0] - o).max() > tol
                      or np.abs(old[2] - tg).max() > tol):
                    changed.append(k)
            removed = [k for k in self._snap if k not in cur]
            # Full recompute when the data outgrew the frozen grid or the
            # map globally moved (loop closure / GBA).  Camera origins count
            # too: a new keyframe whose center drifts outside the frozen box
            # would silently lose all its near-camera free-space samples
            # (carve_votes drops OOB samples per-ray) without ever tripping
            # the target-only fraction.
            all_tg = np.concatenate([v[2] for v in cur.values()])
            all_or = np.stack([v[0] for v in cur.values()])
            oob = ~np.all((all_tg >= self._lo) & (all_tg <= self._hi), axis=1)
            origin_oob = ~np.all(
                (all_or >= self._lo) & (all_or <= self._hi), axis=1
            )
            if (oob.mean() > ccfg.incremental_oob_frac
                    or origin_oob.mean() > ccfg.incremental_origin_oob_frac
                    or len(changed) + len(removed)
                    > ccfg.incremental_churn_frac * max(len(cur), 1)):
                full = True

        if full:
            # Freeze bounds from the current data (carve_mesh's percentile
            # quarantine box) and deposit everything at weight +1.
            all_tg = np.concatenate([v[2] for v in cur.values()])
            all_or = np.concatenate([
                np.broadcast_to(o, tg.shape)
                for (o, _p, tg) in cur.values()
            ])
            lo_p = np.percentile(all_tg, 2.0, axis=0)
            hi_p = np.percentile(all_tg, 98.0, axis=0)
            center = 0.5 * (lo_p + hi_p)
            half = 0.5 * (hi_p - lo_p) * float(ccfg.bounds_scale) + 1e-3
            # Cushion the camera-origin extents (50% of their own span plus
            # 5% of the scene box): future keyframes move near the current
            # trajectory, and bounds that hug today's origins would trip the
            # origin-OOB full-recompute trigger on almost every new keyframe.
            o_lo = all_or.min(axis=0)
            o_hi = all_or.max(axis=0)
            o_pad = 0.5 * (o_hi - o_lo) + 0.05 * (hi_p - lo_p) + 1e-3
            self._lo = np.minimum(center - half, o_lo - o_pad)
            self._hi = np.maximum(center + half, o_hi + o_pad)
            self._votes, self._evidence = self._deposit(all_or, all_tg, 1.0)
            self._snap = dict(cur)
            self.n_full_recarves += 1
        else:
            if not changed and not removed and self.vertices is not None:
                return False              # nothing moved since last mesh
            subs = [self._snap[k] for k in changed if k in self._snap]
            subs += [self._snap[k] for k in removed]
            adds = [cur[k] for k in changed]
            for group, w in ((subs, -1.0), (adds, 1.0)):
                if not group:
                    continue
                tg = np.concatenate([g[2] for g in group])
                og = np.concatenate([
                    np.broadcast_to(g[0], g[2].shape) for g in group
                ])
                dv, de = self._deposit(og, tg, w)
                self._votes = self._votes + dv
                self._evidence = self._evidence + de
            for k in removed:
                del self._snap[k]
            for k in changed:
                self._snap[k] = cur[k]
            self.n_inc_updates += 1

        # Label + extract from the persistent grids (shared back half of
        # carve_mesh).
        field = carving.mrf_relax(
            self._votes, self._evidence, lambda_smooth=ccfg.lambda_smooth,
            iterations=ccfg.mrf_iterations,
            free_threshold=ccfg.free_vote_threshold,
        )
        ev_dil = carving.dilate_evidence(
            self._evidence, radius=ccfg.evidence_dilation)
        fx, fy, fz = carving.boundary_faces(field, ev_dil)
        R = self.cfg.carving.grid_resolution
        cells, counts = carving.extract_face_cells(fx, fy, fz, cap=6 * R * R)
        cells_np, counts_np = jax.device_get((cells, counts))
        _check_face_overflow(counts_np, 6 * R * R)
        verts, faces = surface_nets_cells(
            cells_np, counts_np, R,
            self._lo.astype(np.float32), self._hi.astype(np.float32),
        )
        self.vertices, self.faces, self.field = verts, faces, field
        return True

    # ------------------------------------------------------------------
    def save_obj(self, path: str):
        """OBJ writer (FreespaceDelaunayAlgorithm::writeObj ``.cc:734-762``)."""
        if self.vertices is None:
            self.update_mesh()
        v = self.vertices if self.vertices is not None else np.zeros((0, 3))
        f = self.faces if self.faces is not None else np.zeros((0, 3), np.int64)
        with open(path, "w") as fh:
            for p in v:
                fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
            for tri_ in f:
                fh.write(f"f {tri_[0]+1} {tri_[1]+1} {tri_[2]+1}\n")

    def write_transcript(self, path: str):
        """Serialize the event journal in the reference transcript dialect
        (``SFMTranscriptInterface_ORBSLAM.cpp:154-316`` command vocabulary) so
        reconstructions are replayable/checkpointable — the loader lives in
        models/transcript.py (parse_transcript + replay_mesh)."""
        from orb_slam_free_space_carving_tpu.models import transcript

        transcript.write_transcript(self.host.journal, path)
