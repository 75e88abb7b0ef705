"""Local mapping: keyframe processing, point creation, local BA, culling.

TPU re-design of ``LocalMapping`` (reference ``src/LocalMapping.cc``).  The
thread + keyframe queue becomes a stage object whose ``on_keyframe`` is invoked
by the tracker (inline in deterministic mode; via the async runtime otherwise).
Numeric steps are jitted batched kernels:

- ``CreateNewMapPoints`` (``:220-465``): per covisible neighbor, one dense
  epipolar-constrained Hamming match over *all* unbound feature pairs + one
  batched DLT triangulation + the acceptance cascade as mask reductions
  (vs. the reference's per-pair scalar loops);
- ``MapPointCulling`` (``:181-218``): found-ratio/observation-count rules over
  the whole recent-point set at once;
- local BA (``Optimizer::LocalBundleAdjustment``, ``src/Optimizer.cc:453-791``):
  the Schur-complement LM solver in ops/ba.py over a fixed-capacity window;
- ``SearchInNeighbors`` fuse (``:467-547``): projection matching of the new
  keyframe's points into neighbors to add missed observations / merge
  duplicates;
- ``KeyFrameCulling`` (``:645-709``): 90%-redundancy rule on host counters.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.ops import ba, matching, triangulation as tri
from orb_slam_free_space_carving_tpu.utils import camera, lie, timing


def _pow2(n: int, lo: int = 64) -> int:
    """Static bucket size for data-dependent batch lengths: every distinct
    shape is a fresh XLA compile through the TPU tunnel (seconds each), so
    variable-size device updates pad to power-of-two buckets and mask."""
    return max(lo, 1 << max(int(n) - 1, 0).bit_length())


# ---------------------------------------------------------------------------
# Jitted kernels
# ---------------------------------------------------------------------------

@jax.jit
def _epipolar_triangulate_batch(
    pose1, pose2_b, uv1, oct1, ang1, desc1, free1, word1,
    uv2_b, oct2_b, ang2_b, desc2_b, free2_b, word2_b, intr,
    inv_sigma2_by_level,
):
    """vmapped :func:`_epipolar_triangulate_pair` over a padded neighbor batch
    — ONE dispatch triangulates the new keyframe against all covisible
    neighbors (the reference loops 20 neighbors sequentially,
    ``LocalMapping.cc:250-``)."""
    return jax.vmap(
        _epipolar_triangulate_pair,
        in_axes=(None, 0, None, None, None, None, None, None, 0, 0, 0, 0,
                 0, 0, None, None),
    )(pose1, pose2_b, uv1, oct1, ang1, desc1, free1, word1,
      uv2_b, oct2_b, ang2_b, desc2_b, free2_b, word2_b, intr,
      inv_sigma2_by_level)


@functools.partial(jax.jit, static_argnames=("vocab_levels",))
def _create_points_fused(m, kf, nbp, nb_mask, own_row, nb_obs_rows, vocab_tv,
                         intr, inv_sigma2_by_level, vocab_levels=4):
    """ONE dispatch for the whole CreateNewMapPoints numeric pipeline
    (``LocalMapping.cc:220-465``): median-depth + baseline gates, vocabulary
    node assignment for the keyframe and every neighbor, epipolar-gated
    same-node matching, batched DLT + GN triangulation, acceptance cascade,
    and first-good-neighbor conflict resolution.

    The previous host orchestration issued ~30 eager device ops + several
    full-array pulls per keyframe; over the TPU tunnel (~2-25 ms per RPC,
    serialized against the tracking thread's dispatches) that cost seconds
    per keyframe — the direct cause of worker backlog and keyframe
    starvation.  Returns per-feature (first_nb, feats2, xyz, any_good) and
    the per-neighbor keep mask; the host only allocates ids and scatters.
    """
    from orb_slam_free_space_carving_tpu.ops import bow

    M = m.pt_xyz.shape[0]
    pose1 = m.kf_pose[kf]
    c1 = lie.se3_inverse(pose1)[4:7]

    # Median scene depth over the keyframe's bound points (gate :250-274).
    own_valid = own_row >= 0
    pts_own = m.pt_xyz[jnp.clip(own_row, 0, M - 1)]
    z_own = lie.se3_apply(pose1, pts_own)[..., 2]
    z_sorted = jnp.sort(jnp.where(own_valid, z_own, jnp.inf))
    n_own = jnp.sum(own_valid)
    med_depth = z_sorted[jnp.clip(n_own // 2, 0, z_own.shape[0] - 1)]

    centers = lie.se3_inverse(m.kf_pose[nbp])[:, 4:7]
    baselines = jnp.linalg.norm(centers - c1, axis=-1)
    keep = nb_mask & (baselines / jnp.maximum(med_depth, 1e-9) >= 0.01) \
        & (n_own >= 10)

    # Vocabulary nodes (FeatureVector analog) for kf + neighbors, in-program.
    # The matcher gate compares COARSE tree nodes (the reference's
    # FeatureVector ancestor gate at levelsup, TemplatedVocabulary.h) —
    # leaf-level equality drops ~95% of true correspondences and starved
    # map-point creation.
    _, word1 = bow.tree_words_nodes(
        m.kf_desc[kf], m.kf_feat_valid[kf], vocab_tv, vocab_levels
    )
    word2_b = jax.vmap(
        lambda d, v: bow.tree_words_nodes(d, v, vocab_tv, vocab_levels)[1]
    )(m.kf_desc[nbp], m.kf_feat_valid[nbp])

    free1 = (own_row < 0) & m.kf_feat_valid[kf]
    free2_b = (nb_obs_rows < 0) & m.kf_feat_valid[nbp] & keep[:, None]

    idx_b, xyz_b, good_b = jax.vmap(
        _epipolar_triangulate_pair,
        in_axes=(None, 0, None, None, None, None, None, None, 0, 0, 0, 0,
                 0, 0, None, None),
    )(pose1, m.kf_pose[nbp], m.kf_uv[kf], m.kf_octave[kf], m.kf_angle[kf],
      m.kf_desc[kf], free1, word1,
      m.kf_uv[nbp], m.kf_octave[nbp], m.kf_angle[nbp], m.kf_desc[nbp],
      free2_b, word2_b, intr, inv_sigma2_by_level)

    good_b = good_b & keep[:, None]
    first_nb = jnp.argmax(good_b, axis=0).astype(jnp.int32)       # [N]
    any_good = jnp.any(good_b, axis=0)
    N = idx_b.shape[1]
    rows = jnp.arange(N)
    feats2 = idx_b[first_nb, rows]
    xyz = xyz_b[first_nb, rows]
    return first_nb, feats2, xyz, any_good


@jax.jit
def _fuse_project_batch(pose_b, pt_xyz, pt_desc, pt_valid, pt_maxdist,
                        pt_normal, kf_uv_b, kf_oct_b, kf_desc_b,
                        kf_feat_valid_b, kf_free_b, intr, scale_factor,
                        n_levels, wh):
    return jax.vmap(
        _fuse_project,
        in_axes=(0, None, None, None, None, None, 0, 0, 0, 0, 0, None,
                 None, None, None),
    )(pose_b, pt_xyz, pt_desc, pt_valid, pt_maxdist, pt_normal,
      kf_uv_b, kf_oct_b, kf_desc_b, kf_feat_valid_b, kf_free_b, intr,
      scale_factor, n_levels, wh)


def _epipolar_triangulate_pair(
    pose1, pose2, uv1, oct1, ang1, desc1, free1, word1,
    uv2, oct2, ang2, desc2, free2, word2, intr, inv_sigma2_by_level,
):
    """Match unbound features across one keyframe pair along epipolar lines and
    triangulate (SearchForTriangulation ``ORBmatcher.cc:657-823`` + the
    triangulation block of ``LocalMapping.cc:297-463``).

    ``word1``/``word2`` are vocabulary word assignments (-1 invalid): only
    same-word pairs are match candidates — the reference's FeatureVector
    node gate, without which wide-baseline pairs (low-covisibility
    neighbors) hallucinate epipolar-consistent false matches that poison
    the map.

    Returns (match_idx[N] into kf2 features, xyz[N,3], good[N]).
    """
    # Fundamental matrix F12 from relative pose (ComputeF12, LocalMapping.cc:549-566).
    T12 = lie.se3_compose(pose1, lie.se3_inverse(pose2))
    R12, t12 = lie.se3_to_Rt(T12)
    K = jnp.array(
        [[intr[0], 0.0, intr[2]], [0.0, intr[1], intr[3]], [0.0, 0.0, 1.0]],
        dtype=uv1.dtype,
    )
    Kinv = jnp.linalg.inv(K)
    F12 = Kinv.T @ lie.hat(t12) @ R12 @ Kinv

    # Epipolar distance of every kf2 feature to the line of every kf1 feature:
    # with x1^T F12 x2 = 0, the line in image 2 for x1 is l2 = F12^T x1.
    p1h = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1)
    lines2 = p1h @ F12                          # [N,3] (row vector x1^T F12)
    num = (lines2[:, None, 0] * uv2[None, :, 0]
           + lines2[:, None, 1] * uv2[None, :, 1]
           + lines2[:, None, 2]) ** 2
    den = jnp.maximum(lines2[:, None, 0] ** 2 + lines2[:, None, 1] ** 2, 1e-12)
    epi_d2 = num / den                          # [N,M]

    sigma2_2 = 1.0 / inv_sigma2_by_level[jnp.clip(oct2, 0, inv_sigma2_by_level.shape[0] - 1)]
    epi_ok = epi_d2 < 3.84 * sigma2_2[None, :]  # ORBmatcher.cc:745- epipolar gate

    # Distance from the epipole in image 2 must be large enough (:741-752).
    c1_w = lie.se3_inverse(pose1)[4:7]
    e2_c = lie.se3_apply(pose2, c1_w[None, :])[0]
    behind = e2_c[2] < 1e-6
    ex = jnp.where(behind, 1e9, intr[0] * e2_c[0] / jnp.maximum(e2_c[2], 1e-6) + intr[2])
    ey = jnp.where(behind, 1e9, intr[1] * e2_c[1] / jnp.maximum(e2_c[2], 1e-6) + intr[3])
    de2 = (uv2[:, 0] - ex) ** 2 + (uv2[:, 1] - ey) ** 2
    epi_far = de2[None, :] >= 100.0 * sigma2_2[None, :]

    dist = matching.hamming_matrix(desc1, desc2)
    same_word = (word1[:, None] == word2[None, :]) & (word1 >= 0)[:, None]
    mask = epi_ok & epi_far & same_word & free1[:, None] & free2[None, :]
    idx, best = matching.masked_match(dist, mask, max_dist=50.0)
    idx = matching.rotation_consistency(idx, ang1, ang2)
    idx = matching._dedup_targets(idx, best, uv2.shape[0])

    # Triangulate matched pairs.
    sel = jnp.clip(idx, 0, uv2.shape[0] - 1)
    P1 = tri.projection_matrix(pose1, intr)
    P2 = tri.projection_matrix(pose2, intr)
    xyz = tri.triangulate_dlt(uv1, uv2[sel], P1, P2)
    xyz = tri.refine_triangulation(xyz, uv1, uv2[sel], pose1, pose2, intr)
    s2_1 = 1.0 / inv_sigma2_by_level[jnp.clip(oct1, 0, inv_sigma2_by_level.shape[0] - 1)]
    good = tri.check_triangulation(
        xyz, pose1, pose2, intr, uv1, uv2[sel],
        s2_1, sigma2_2[sel], chi2_th=5.991,
    )
    good = good & (idx >= 0)
    return idx, xyz, good


@jax.jit
def _fuse_project(pose_kf, pt_xyz, pt_desc, pt_valid, pt_maxdist, pt_normal,
                  kf_uv, kf_oct, kf_desc, kf_feat_valid, kf_free, intr,
                  scale_factor, n_levels, wh):
    """Project candidate points into a keyframe and match to its unbound
    features (the add-missed-observation half of ``ORBmatcher::Fuse``
    ``ORBmatcher.cc:825-975``).  Returns idx[P] into the KF's features."""
    ok, uv, z, dist, _ = camera.in_frustum(
        pt_xyz, pose_kf, intr, wh[0], wh[1], normals_w=pt_normal,
        view_cos_limit=0.5,
    )
    vis = ok & pt_valid
    pred = camera.predict_scale_level(dist, pt_maxdist, scale_factor, n_levels)
    radii = 3.0 * scale_factor ** pred.astype(jnp.float32)
    dmat = matching.hamming_matrix(pt_desc, kf_desc)
    m = matching.window_mask(uv, kf_uv, radii, vis, kf_feat_valid & kf_free)
    m = m & matching.octave_mask(pred, kf_oct, -1, 1)
    idx, best = matching.masked_match(dmat, m, max_dist=50.0)
    idx = matching._dedup_targets(idx, best, kf_uv.shape[0])
    return idx


@functools.partial(jax.jit, static_argnames=("iterations",))
def _local_ba(cam_poses, cam_free, points, point_valid, obs_cam, obs_point,
              obs_uv, obs_is2, obs_mask, intr, iterations, obs_ur=None,
              bf=0.0, lm_lambda0=1e-4, lm_lambda_factor=2.0):
    prob = ba.BAProblem(
        cam_poses=cam_poses, cam_free=cam_free, points=points,
        point_valid=point_valid, obs_cam=obs_cam, obs_point=obs_point,
        obs_uv=obs_uv, obs_inv_sigma2=obs_is2, obs_mask=obs_mask,
        obs_ur=obs_ur,
    )
    return ba.ba_solve(prob, intr, iterations=iterations, bf=bf,
                       lm_lambda0=lm_lambda0,
                       lm_lambda_factor=lm_lambda_factor)


# ---------------------------------------------------------------------------
# Stage
# ---------------------------------------------------------------------------

class LocalMapper:
    def __init__(self, cfg: SystemConfig, map_arrays_ref, map_host: ms.MapHost,
                 loop_closer=None):
        self.cfg = cfg
        self._map_ref = map_arrays_ref
        self.host = map_host
        self.loop_closer = loop_closer
        self.intr = camera.intrinsics_array(cfg.camera)
        self.wh = (cfg.camera.width, cfg.camera.height)
        self._inv_sigma2 = jnp.asarray(
            1.0 / np.array(cfg.orb.level_sigma2, np.float32)
        )
        self.recent_points: List[tuple] = []   # (pid, created_at_fuse_round)
        self.kf_counter = 0
        # Completed refine (fuse + BA) rounds: the probation clock for point
        # culling.  The reference ages points in KEYFRAMES because its fuse
        # runs synchronously per keyframe (LocalMapping.cc:181-218); here
        # refinement rides the deferred lane and coalesces under backlog, so
        # keyframe age would execute healthy 2-obs points before fuse ever
        # had a chance to add their third observation (measured: 2/3 of all
        # created points culled on the async bench).  In deterministic mode
        # refine runs per keyframe and the two clocks coincide.
        self.fuse_counter = 0
        self.ba_times_ms: List[float] = []
        self.runner = None                     # set by System (async pipeline)
        # Hierarchical vocabulary: the triangulation matcher gates on the
        # coarse tree node layer (the DBoW2 FeatureVector levelsup analog).
        from orb_slam_free_space_carving_tpu.ops import bow

        self._vocab = bow.get_vocabulary(cfg.loop)

    @property
    def m(self) -> ms.MapArrays:
        return self._map_ref[0]

    @m.setter
    def m(self, v):
        self._map_ref[0] = v

    def is_idle(self) -> bool:
        """LocalMapping::AcceptKeyFrames analog: has the stage queue drained?
        Feeds the keyframe policy's c1b condition (Tracking.cc:1029)."""
        return self.runner is None or self.runner.is_idle()

    def accepts_keyframes(self) -> bool:
        """c1b gate: idle, or a small bounded CRITICAL-lane backlog.  The
        reference's monocular branch refuses KFs while mapping is busy but
        ABORTS the running local BA to drain fast (Tracking.cc:1041-1059
        InterruptBA); its stereo branch queues up to 3.  Here refinement
        rides the deferred lane (preempted by keyframe work) AND queued
        keyframes coalesce their triangulation (see on_keyframe), so a
        deeper backlog stays serviceable — without this a busy worker
        throttles keyframes to the c1a fallback cadence, the map lags the
        camera, and tracking starves to death mid-trajectory."""
        return (self.runner is None
                or self.runner.backlog(self.runner.CRITICAL) < 4)

    def _later_kf_waiting(self) -> bool:
        """True when another keyframe item is already queued behind the one
        being processed (backlog counts the running item)."""
        return (self.runner is not None and not self.runner.deterministic
                and self.runner.backlog(self.runner.CRITICAL) > 1)

    # ------------------------------------------------------------------
    def on_keyframe(self, kf: int):
        self.kf_counter += 1
        n_init_kfs = 2 if self.cfg.sensor == "monocular" else 1
        if self.kf_counter <= n_init_kfs:
            # The init keyframes arrive fully built (mono: two KFs + init BA;
            # stereo/RGB-D: one KF with depth-unprojected points).
            if self.loop_closer is not None:
                self.loop_closer.on_keyframe(kf)
            return
        # Coalescing under backlog: when newer keyframes already wait in the
        # critical lane, this keyframe only pays the cheap half (its arrays
        # were inserted by the mapside item; covisibility + journal done) —
        # the NEWEST queued keyframe runs the one triangulation/culling pass,
        # with all the skipped keyframes present as covisible neighbors.
        # This keeps worker service rate above keyframe demand when the
        # tracker runs faster than real time (the single device is shared:
        # every worker sync waits behind queued tracker programs, so per-KF
        # worker cost is ~0.4 s while the circuit demands ~3 KF/s).
        # Starvation bound on coalescing: the newest-KF-only rule kept the
        # worker serviceable, but under sustained backlog it triangulated
        # only ~1 in 9 keyframes (measured: 13 create passes for 118 KFs)
        # and the tracker bled out as the viewpoint rotated into regions
        # with no points yet.  Force a pass every 3rd keyframe regardless
        # of backlog — the map's freshness is worth one 0.4 s stall.
        force_create = (
            self.kf_counter - getattr(self, "_last_create_counter", 0) >= 3
        )
        if self._later_kf_waiting() and not force_create:
            timing.count("worker.kf_coalesced")
        else:
            self._last_create_counter = self.kf_counter
            with timing.span("worker.cull_points"):
                self._cull_recent_points(kf)
            with timing.span("worker.create_points"):
                self._create_new_points(kf)
        # Reference scheduling (LocalMapping::Run, LocalMapping.cc:56-104):
        # ProcessNewKeyFrame + CreateNewMapPoints run for EVERY keyframe —
        # the tracker's local map freshness depends on them — while
        # SearchInNeighbors + local BA + keyframe culling are refinement
        # that the reference only runs when no newer keyframe waits.  Here
        # refinement rides the runner's DEFERRED lane: critical keyframe
        # items overtake it, and stale refinements coalesce (only the most
        # recently submitted keyframe refines).
        if self.runner is None or self.runner.deterministic:
            self._refine(kf)
        else:
            self._latest_refine_kf = kf
            self.runner.submit(self._refine, kf,
                               priority=self.runner.DEFERRED)
        if self.loop_closer is not None:
            # Loop detection rides the DEFERRED lane: the reference runs it on
            # its own thread (LoopClosing::Run); nothing in the tracker's
            # local-map freshness depends on it, so it must not delay the next
            # keyframe's triangulation.  FIFO within the lane keeps the
            # 3-consecutive-KF consistency accumulation in insertion order.
            if self.runner is None or self.runner.deterministic:
                with timing.span("worker.loop_closing"):
                    self.loop_closer.on_keyframe(kf)
            else:
                self._latest_loop_kf = kf
                self.runner.submit(self._loop_detect, kf,
                                   priority=self.runner.DEFERRED)

    def _loop_detect(self, kf: int):
        if not self.host.kf_valid[kf]:
            return
        if getattr(self, "_latest_loop_kf", kf) != kf:
            # Superseded: a newer keyframe's detection covers this revisit
            # (detection is per-place, not per-frame; a full Sim3 attempt
            # costs ~1 s on a busy device queue and 60 of them starved the
            # deferred lane of every BA/fuse item on the async bench).  The
            # BoW row must still be inserted for future queries.
            with timing.span("worker.loop_closing"):
                self.loop_closer.insert_only(kf)
            return
        with timing.span("worker.loop_closing"):
            self.loop_closer.on_keyframe(kf)

    def _refine(self, kf: int):
        """Fuse + local BA + keyframe culling for ``kf`` (the deferred-lane
        half of keyframe processing)."""
        if (self.runner is not None and not self.runner.deterministic
                and getattr(self, "_latest_refine_kf", kf) != kf
                and self.kf_counter - getattr(self, "_last_refine_done", 0) < 3):
            # A newer keyframe superseded this refinement; its own local BA
            # window covers this keyframe (it is covisible by construction).
            # BUT supersession must not starve refinement entirely: under
            # steady keyframe traffic every refine would be superseded and
            # local BA would never run (measured: 3 BA calls over a 438-frame
            # async bench vs ~20 deterministic) — unrefined monocular
            # geometry drifts until projection windows miss and tracking
            # collapses.  At most 2 consecutive supersessions are honored.
            return
        self._last_refine_done = self.kf_counter
        if not self.host.kf_valid[kf]:
            return
        with timing.span("worker.fuse"):
            self._fuse_neighbors(kf)
        self.fuse_counter += 1
        with timing.span("worker.local_ba"):
            self._local_bundle_adjustment(kf)
        with timing.span("worker.cull_kfs"):
            self._cull_keyframes(kf)

    # ------------------------------------------------------------------
    def _cull_recent_points(self, kf: int):
        """MapPointCulling (LocalMapping.cc:181-218): found/visible < 0.25, or
        too few observations shortly after creation."""
        m = self.m
        if not self.recent_points:
            return
        keep = []
        to_kill = []
        vis, fnd = jax.device_get((
            m.pt_visible + self.host.ctr_visible,
            m.pt_found + self.host.ctr_found,
        ))  # one sync; base (creation/replace) + tracker deltas
        # Observation counts for ALL points in one pass (vs per-point scans).
        sub = self.host.obs_pt[: self.host.n_kf_slots]
        flat = sub[sub >= 0]
        obs_count = np.bincount(flat, minlength=self.cfg.capacity.max_points)
        for pid, born_fuse_count in self.recent_points:
            if not self.host.pt_valid[pid]:
                continue
            age = self.fuse_counter - born_fuse_count
            ratio = fnd[pid] / max(int(vis[pid]), 1)
            nobs = int(obs_count[pid])
            if ratio < self.cfg.mapping.cull_found_ratio:
                to_kill.append(pid)
            elif age >= 2 and nobs <= self.cfg.mapping.cull_min_obs_after - 1:
                to_kill.append(pid)
            elif age >= 3:
                pass  # survived probation
            else:
                keep.append((pid, born_fuse_count))
        self.recent_points = keep
        if to_kill:
            self._delete_points(np.array(to_kill, np.int32))

    def _delete_points(self, pids: np.ndarray):
        """SetBadFlag cascade + CARV del-point events (MapPoint.cc:159-177)."""
        for pid in pids:
            for (k, f) in self.host.point_observations(int(pid)):
                self.host.erase_observation(k, f)
            self.host.free_point(int(pid))
            self.host.journal.append(
                ms.JournalEvent(kind="del_point", point_id=int(pid))
            )
        # Pad to a pow2 bucket (variable kill counts would recompile the
        # invalidate + isin programs per size); pad value M never matches.
        B = _pow2(len(pids))
        M = self.m.pt_xyz.shape[0]
        pids_pad = np.full(B, M, np.int32)
        pids_pad[: len(pids)] = pids
        mask = np.zeros(B, bool)
        mask[: len(pids)] = True
        ids = jnp.asarray(pids_pad)
        self.m = ms.invalidate_points(self.m, ids, jnp.asarray(mask))
        # Clear device obs table rows for those points.
        obs = self.m.obs_pt
        hit = jnp.isin(obs, ids)
        self.m = self.m._replace(obs_pt=jnp.where(hit, -1, obs))

    # ------------------------------------------------------------------
    def _create_new_points(self, kf: int):
        """CreateNewMapPoints (LocalMapping.cc:220-465)."""
        m = self.m
        neighbors = self.host.covisible_keyframes(
            kf, self.cfg.mapping.triangulation_neighbors, min_weight=1
        )
        if neighbors.size == 0:
            return
        own = self.host.obs_pt[kf]
        if (own >= 0).sum() < 10:
            return

        # Pad neighbors to a static bucket (the config knob follows
        # LocalMapping.cc:250's 20 covisible neighbors); ONE fused dispatch
        # does gates + words + matching + triangulation + conflict
        # resolution, ONE device_get brings back the per-feature results.
        NB = max(1, self.cfg.mapping.triangulation_neighbors)
        neighbors = neighbors[:NB]
        nbp = np.zeros(NB, np.int32)
        nb_mask = np.zeros(NB, bool)
        nbp[: neighbors.size] = neighbors
        nb_mask[: neighbors.size] = True

        with timing.span("create.fused_wait"):
            first_nb_d, feats2_d, xyz_d, any_good_d = _create_points_fused(
                m, kf, jnp.asarray(nbp), jnp.asarray(nb_mask),
                jnp.asarray(own), jnp.asarray(self.host.obs_pt[nbp]),
                self._vocab.tv, self.intr, self._inv_sigma2,
                vocab_levels=self._vocab.levels,
            )
            first_nb_np, feats2_np, xyz_np, any_good = jax.device_get(
                (first_nb_d, feats2_d, xyz_d, any_good_d)
            )
        if not any_good.any():
            return
        feats1 = np.where(any_good)[0]
        nb_of = first_nb_np[feats1]
        feats2 = feats2_np[feats1]
        new_xyz = xyz_np[feats1]
        n_new = feats1.size
        c1 = lie.np_se3_inverse(np.asarray(m.kf_pose[kf]))[4:7]
        try:
            pids = self.host.alloc_points(n_new)
        except RuntimeError:
            return
        # Host obs bookkeeping.
        self.host.obs_pt[kf, feats1] = pids
        self.host.obs_pt[nbp[nb_of], feats2] = pids

        d = np.linalg.norm(new_xyz - c1, axis=-1)
        sf = self.cfg.orb.scale_factor
        oct1 = np.asarray(m.kf_octave[kf])[feats1]
        max_dist = d * (sf ** oct1)
        min_dist = max_dist / (sf ** (self.cfg.orb.n_levels - 1))
        normal = (new_xyz - c1) / np.maximum(d[:, None], 1e-9)

        # Pad the new-point batch to a pow2 bucket: n_new differs per
        # keyframe and each distinct size would recompile the whole
        # scatter/gather chain.
        B = _pow2(n_new)
        M = m.pt_xyz.shape[0]
        N0 = own.shape[0]

        def padi(x, fill=0, dtype=None):
            out = np.full((B,) + np.asarray(x).shape[1:], fill,
                          dtype or np.asarray(x).dtype)
            out[:n_new] = x
            return out

        mask = np.zeros(B, bool)
        mask[:n_new] = True
        ids_pad = jnp.asarray(padi(pids.astype(np.int32)))
        feats1_pad = jnp.asarray(padi(feats1.astype(np.int32)))
        mask_j = jnp.asarray(mask)
        m = ms.add_points_arrays(
            m, ids_pad, jnp.asarray(padi(new_xyz.astype(np.float32))),
            m.kf_desc[kf][feats1_pad],
            jnp.asarray(padi(normal.astype(np.float32))),
            jnp.asarray(padi(min_dist.astype(np.float32))),
            jnp.asarray(padi(max_dist.astype(np.float32))),
            jnp.full(B, kf, jnp.int32), jnp.full(B, kf, jnp.int32),
            mask_j,
        )
        f1_safe = jnp.where(mask_j, feats1_pad, N0)
        nb_safe = jnp.asarray(padi(nbp[nb_of].astype(np.int32),
                                   fill=m.kf_pose.shape[0]))
        f2_safe = jnp.asarray(
            padi(feats2.astype(np.int32), fill=N0))
        ids_masked = jnp.where(mask_j, ids_pad, M)
        m = m._replace(
            obs_pt=m.obs_pt
            .at[kf, f1_safe].set(ids_masked, mode="drop")
            .at[nb_safe, f2_safe].set(ids_masked, mode="drop")
        )
        self.m = m
        timing.count("create.n_new", int(n_new))
        for pid in pids:
            self.recent_points.append((int(pid), self.fuse_counter))
        # CARV journal: extend the latest keyframe event's new points.
        for ev in reversed(self.host.journal):
            if ev.kind == "keyframe" and ev.kf == kf:
                ev.new_points = np.concatenate([ev.new_points, new_xyz])
                ev.new_point_ids = np.concatenate(
                    [ev.new_point_ids, pids.astype(np.int64)]
                )
                ev.vis_ids = np.unique(np.concatenate([ev.vis_ids, pids]))
                break

    # ------------------------------------------------------------------
    def _fuse_neighbors(self, kf: int):
        """SearchInNeighbors (LocalMapping.cc:467-547), add-observation half:
        project the new KF's points into 1-hop neighbors and bind unbound
        features that match."""
        m = self.m
        neighbors = self.host.covisible_keyframes(
            kf, self.cfg.mapping.fuse_neighbors, min_weight=1
        )
        own = self.host.obs_pt[kf]
        pt_ids = own[own >= 0]
        if pt_ids.size == 0 or neighbors.size == 0:
            return
        cap = self.cfg.orb.n_features_pad
        pad = np.zeros(cap, np.int32)
        msk = np.zeros(cap, bool)
        z = min(pt_ids.size, cap)
        pad[:z] = pt_ids[:z]
        msk[:z] = True
        ids_j = jnp.asarray(pad)

        # Static bucket sized by the config knob (SearchInNeighbors uses 10
        # 1-hop + 5 2-hop neighbors, LocalMapping.cc:471-484).
        NB = max(1, self.cfg.mapping.fuse_neighbors)
        neighbors = neighbors[:NB]
        nbp = np.zeros(NB, np.int32)
        nb_mask = np.zeros(NB, bool)
        nbp[: neighbors.size] = neighbors
        nb_mask[: neighbors.size] = True
        nb_j = jnp.asarray(nbp)
        nb_free_b = jnp.asarray(self.host.obs_pt[nbp] < 0) & jnp.asarray(
            nb_mask
        )[:, None]
        idx_b = _fuse_project_batch(
            m.kf_pose[nb_j],
            m.pt_xyz[ids_j], m.pt_desc[ids_j],
            m.pt_valid[ids_j] & jnp.asarray(msk),
            m.pt_max_dist[ids_j], m.pt_normal[ids_j],
            m.kf_uv[nb_j], m.kf_octave[nb_j], m.kf_desc[nb_j],
            m.kf_feat_valid[nb_j], nb_free_b, self.intr,
            self.cfg.orb.scale_factor, self.cfg.orb.n_levels, self.wh,
        )
        idx_np = np.asarray(idx_b)            # [NB,P]
        hit = (idx_np >= 0) & nb_mask[:, None] & msk[None, :]
        if hit.any():
            # Host mirror (vectorized) + ONE static-shape device scatter:
            # invalid lanes get an OOB feature index and are dropped.
            bi, pi = np.where(hit)
            self.host.obs_pt[nbp[bi], idx_np[bi, pi]] = pad[pi]
            N0 = self.host.obs_pt.shape[1]
            tgt = np.where(hit, idx_np, N0).astype(np.int32)
            vals = np.broadcast_to(pad[None, :], idx_np.shape).astype(np.int32)
            m = m._replace(
                obs_pt=m.obs_pt.at[nb_j[:, None], jnp.asarray(tgt)].set(
                    jnp.asarray(vals), mode="drop"
                )
            )
            self.m = m
        self.host.update_covisibility(kf)

    # ------------------------------------------------------------------
    def _ba_window(self, kf: int):
        """Select (free KFs, fixed KFs, points, observations) for local BA
        (Optimizer.cc:455-504)."""
        cap = self.cfg.capacity
        free_kfs = [kf] + [
            int(k) for k in self.host.covisible_keyframes(
                kf, cap.local_ba_window - 1, min_weight=1
            )
        ]
        free_set = set(free_kfs)
        # Points seen by the window (vectorized over the window's obs rows).
        own_rows = self.host.obs_pt[np.asarray(free_kfs, np.int64)]
        pt_ids = np.unique(own_rows[own_rows >= 0])[: cap.local_ba_points]
        # Fixed anchors: other KFs observing those points — one vectorized
        # membership test over the whole obs table instead of a per-slot
        # np.isin loop (this assembly runs on the worker's critical path).
        n_slots = self.host.n_kf_slots
        sub = self.host.obs_pt[:n_slots]
        seen = np.zeros(cap.max_points, bool)
        seen[pt_ids] = True
        hit_rows = (seen[sub.clip(min=0)] & (sub >= 0)).any(axis=1)
        hit_rows &= self.host.kf_valid[:n_slots]
        if free_set:
            hit_rows[np.asarray(free_kfs, np.int64)] = False
        fixed = np.where(hit_rows)[0][: cap.local_ba_fixed].tolist()
        # Keep gauge: always fix at least the two oldest in window if no anchor.
        if not fixed and len(free_kfs) > 2:
            fixed = [free_kfs[-1]]
            free_kfs = free_kfs[:-1]
            free_set = set(free_kfs)
        return free_kfs, fixed, pt_ids

    def _local_bundle_adjustment(self, kf: int):
        import time

        m = self.m
        cap = self.cfg.capacity
        free_kfs, fixed_kfs, pt_ids = self._ba_window(kf)
        all_kfs = free_kfs + fixed_kfs
        C = cap.local_ba_window + cap.local_ba_fixed
        P = cap.local_ba_points
        O = cap.local_ba_obs
        if pt_ids.size < 20:
            return

        all_kfs_arr = np.asarray(all_kfs, np.int64)
        # One batched pull of everything the window needs (single sync).
        # Gather indices pad to the static capacities: len(all_kfs) and
        # pt_ids.size vary per window and would recompile the gather chain.
        kf_idx_pad_np = np.zeros(C, np.int64)
        kf_idx_pad_np[: len(all_kfs)] = all_kfs_arr
        pt_idx_pad_np = np.zeros(P, np.int64)
        pt_idx_pad_np[: pt_ids.size] = pt_ids
        kf_idx_j = jnp.asarray(kf_idx_pad_np)
        pt_idx_j = jnp.asarray(pt_idx_pad_np)
        kf_pose_np, pts_sel, kf_uv_sel, kf_oct_sel, kf_ur_sel = jax.device_get((
            m.kf_pose[kf_idx_j], m.pt_xyz[pt_idx_j],
            m.kf_uv[kf_idx_j], m.kf_octave[kf_idx_j], m.kf_ur[kf_idx_j],
        ))

        cam_poses = np.zeros((C, 7), np.float32)
        cam_poses[:, 0] = 1.0
        cam_free = np.zeros(C, bool)
        cam_poses[: len(all_kfs)] = kf_pose_np[: len(all_kfs)]
        cam_free[: len(free_kfs)] = True
        # Never optimize the very first keyframe (gauge, Optimizer.cc:497).
        cam_free[: len(all_kfs)] &= all_kfs_arr != 0

        pts = np.zeros((P, 3), np.float32)
        ptv = np.zeros(P, bool)
        pts[: pt_ids.size] = pts_sel[: pt_ids.size]
        ptv[: pt_ids.size] = True

        # Vectorized observation assembly: every (window kf, feature) slot
        # bound to a window point becomes one obs row.
        rows = self.host.obs_pt[all_kfs_arr]            # [W,N]
        # Map point id -> slot via a lookup table.
        pt_lut = np.full(self.cfg.capacity.max_points, -1, np.int32)
        pt_lut[pt_ids] = np.arange(pt_ids.size, dtype=np.int32)
        slot = np.where(rows >= 0, pt_lut[rows.clip(min=0)], -1)  # [W,N]
        wi, fi = np.where(slot >= 0)
        if wi.size > O:
            wi, fi = wi[:O], fi[:O]
        n_obs = wi.size
        is2_lv = 1.0 / np.array(self.cfg.orb.level_sigma2, np.float32)
        obs_cam = np.zeros(O, np.int32)
        obs_point = np.zeros(O, np.int32)
        obs_uv = np.zeros((O, 2), np.float32)
        obs_is2 = np.ones(O, np.float32)
        obs_mask = np.zeros(O, bool)
        obs_cam[:n_obs] = wi
        obs_point[:n_obs] = slot[wi, fi]
        obs_uv[:n_obs] = kf_uv_sel[wi, fi]
        obs_is2[:n_obs] = is2_lv[kf_oct_sel[wi, fi].clip(0, len(is2_lv) - 1)]
        obs_mask[:n_obs] = True
        obs_src_k = all_kfs_arr[wi].astype(np.int32)
        obs_src_f = fi.astype(np.int32)

        obs_ur = None
        if self.cfg.sensor != "monocular":
            # Stereo residual rows (EdgeStereoSE3ProjectXYZ, Optimizer.cc:158-186).
            obs_ur_np = np.full(O, -1.0, np.float32)
            obs_ur_np[:n_obs] = kf_ur_sel[wi, fi]
            obs_ur = jnp.asarray(obs_ur_np)

        t0 = time.perf_counter()
        res = _local_ba(
            jnp.asarray(cam_poses), jnp.asarray(cam_free), jnp.asarray(pts),
            jnp.asarray(ptv), jnp.asarray(obs_cam), jnp.asarray(obs_point),
            jnp.asarray(obs_uv), jnp.asarray(obs_is2), jnp.asarray(obs_mask),
            self.intr,
            self.cfg.optimizer.local_ba_iterations_a
            + self.cfg.optimizer.local_ba_iterations_b,
            obs_ur=obs_ur, bf=self.cfg.camera.bf,
            lm_lambda0=self.cfg.optimizer.lm_lambda_init,
            lm_lambda_factor=self.cfg.optimizer.lm_lambda_factor,
        )
        # One batched pull (single sync): poses, points, chi2, camera centers.
        new_poses_np, new_pts_np, chi2_all, new_centers = jax.device_get((
            res.cam_poses, res.points, res.obs_chi2,
            lie.se3_inverse(res.cam_poses)[:, 4:7],
        ))
        self.ba_times_ms.append(1e3 * (time.perf_counter() - t0))

        # Divergence guard (the reference's abortable BA simply skips the
        # writeback, LocalMapping.cc:640-643): a solution that makes most of
        # the window an outlier is discarded wholesale.
        chi2_w = chi2_all[:n_obs]
        # NaN-aware: ~(chi2 <= th) counts non-finite rows as outliers, so a
        # diverged solve (NaN chi2 compares False both ways) is discarded.
        bad_frac = float((~(chi2_w <= self.cfg.optimizer.chi2_mono)).mean()) \
            if n_obs else 0.0
        import os as _os

        if _os.environ.get("OSFSC_DEBUG"):
            import sys as _sys

            print(f"[osfsc] localBA kf={kf} obs={n_obs} "
                  f"bad_frac={bad_frac:.2f}", file=_sys.stderr, flush=True)
        if n_obs and bad_frac > 0.5:
            timing.count("ba.discarded")
            return
        if not (np.all(np.isfinite(new_poses_np))
                and np.all(np.isfinite(new_pts_np))):
            timing.count("ba.discarded")
            return
        timing.count("ba.accepted")

        # Write back poses + points (pad slot indices to capacity C; unused
        # and fixed lanes get an OOB index and are dropped by the scatter).
        K = m.kf_pose.shape[0]
        kf_idx_pad = np.full(C, K, np.int64)
        kf_idx_pad[: len(all_kfs)] = np.where(
            cam_free[: len(all_kfs)], all_kfs_arr, K
        )
        pt_scatter = np.full(P, m.pt_xyz.shape[0], np.int64)
        pt_scatter[: pt_ids.size] = pt_ids
        m = m._replace(
            kf_pose=m.kf_pose.at[jnp.asarray(kf_idx_pad)].set(
                res.cam_poses, mode="drop"
            ),
            pt_xyz=m.pt_xyz.at[jnp.asarray(pt_scatter)].set(
                res.points, mode="drop"
            ),
        )

        # Outlier erasure (Optimizer.cc:711-757): chi2 > 5.991 -> drop obs,
        # batched into a single device scatter.
        chi2 = chi2_all[:n_obs]
        bad = np.where(chi2 > self.cfg.optimizer.chi2_mono)[0]
        if bad.size:
            ks = obs_src_k[bad]
            fs = obs_src_f[bad]
            pids_bad = self.host.obs_pt[ks, fs]
            ok_rows = pids_bad >= 0
            ks, fs, pids_bad = ks[ok_rows], fs[ok_rows], pids_bad[ok_rows]
            self.host.obs_pt[ks, fs] = -1
            Bk = _pow2(ks.size)
            K = m.kf_pose.shape[0]
            ks_pad = np.full(Bk, K, np.int32)
            fs_pad = np.zeros(Bk, np.int32)
            ks_pad[: ks.size] = ks
            fs_pad[: fs.size] = fs
            m = m._replace(
                obs_pt=m.obs_pt.at[jnp.asarray(ks_pad), jnp.asarray(fs_pad)]
                .set(-1, mode="drop")
            )
            for k, pid in zip(ks.tolist(), pids_bad.tolist()):
                self.host.journal.append(
                    ms.JournalEvent(kind="del_obs", kf=k, point_id=pid)
                )
            self.m = m
            # Points left with <2 observations die (batched).
            from orb_slam_free_space_carving_tpu.runtime import mapstore

            counts = mapstore.obs_counts(
                self.host.obs_pt[: self.host.n_kf_slots],
                self.host.kf_valid[: self.host.n_kf_slots].astype(np.uint8),
                self.cfg.capacity.max_points,
            )
            orphans = np.unique(pids_bad[counts[pids_bad] < 2])
            if orphans.size:
                self._delete_points(orphans.astype(np.int32))
        else:
            self.m = m
        self.m = ms.update_point_stats(
            self.m, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels, refresh_desc=True,
            medoid_cap=self.cfg.capacity.max_obs_per_point,
        )

        # CARV adjustment event (moved cams + moved points).
        self.host.journal.append(ms.JournalEvent(
            kind="adjust",
            moved_ids=pt_ids.copy(),
            moved_xyz=new_pts_np[: pt_ids.size],
            moved_kfs=np.array(free_kfs, np.int64),
            moved_centers=new_centers[: len(free_kfs)],
        ))

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: int):
        """KeyFrameCulling (LocalMapping.cc:645-709): a covisible KF whose
        >=90% points are observed by >=3 other keyframes is redundant."""
        import os as _os

        if _os.environ.get("OSFSC_NO_KFCULL"):
            return
        sub = self.host.obs_pt[: self.host.n_kf_slots]
        flat = sub[sub >= 0]
        obs_count = np.bincount(flat, minlength=self.cfg.capacity.max_points)
        protected = -1
        if getattr(self, "protected_kf", None) is not None:
            protected = int(self.protected_kf())
        for cand in self.host.covisible_keyframes(kf, 10, min_weight=1):
            cand = int(cand)
            if cand in (0, 1) or cand == kf or cand == protected:
                continue
            row = self.host.obs_pt[cand]
            pids = row[row >= 0]
            if pids.size == 0:
                continue
            redundant = int((obs_count[pids] >= 4).sum())  # self + 3 others
            if redundant >= self.cfg.mapping.kf_cull_redundancy * pids.size:
                self._remove_keyframe(cand)
                sub = self.host.obs_pt[: self.host.n_kf_slots]
                obs_count = np.bincount(
                    sub[sub >= 0], minlength=self.cfg.capacity.max_points
                )

    def _remove_keyframe(self, kf: int):
        """SetBadFlag for a keyframe (KeyFrame.cc:479-535): drop observations,
        re-parent children, free the slot, emit CARV del-obs events."""
        import os as _os

        if _os.environ.get("OSFSC_DEBUG"):
            import sys as _sys

            print(f"[osfsc] cull KF {kf}", file=_sys.stderr, flush=True)
        row = self.host.obs_pt[kf]
        feats = np.where(row >= 0)[0]
        for f in feats:
            pid = int(row[f])
            self.host.erase_observation(kf, f)
            self.host.journal.append(
                ms.JournalEvent(kind="del_obs", kf=kf, point_id=pid)
            )
        self.m = self.m._replace(
            obs_pt=self.m.obs_pt.at[kf].set(jnp.full_like(self.m.obs_pt[kf], -1)),
            kf_valid=self.m.kf_valid.at[kf].set(False),
        )
        self.host.kf_valid[kf] = False
        self.host.covis[kf, :] = 0
        self.host.covis[:, kf] = 0
        # Re-parent children in the spanning tree.
        children = np.where(self.host.parent == kf)[0]
        for ch in children:
            self.host.parent[ch] = self.host.parent[kf]
        self.host.parent[kf] = -1
