"""Tracking: per-frame localization state machine.

TPU re-design of ``Tracking`` (reference ``src/Tracking.cc``).  The state
machine {NO_IMAGES_YET, NOT_INITIALIZED, OK, LOST} (``Tracking.h:93-99``) and
its decision thresholds live on the host; every numeric step is a jitted
batched kernel:

- monocular initialization = windowed bootstrap match + batched H/F RANSAC
  (``MonocularInitialization`` ``Tracking.cc:572-746`` -> ops/twoview.py);
- TrackWithMotionModel (``:876-937``) = constant-velocity prediction +
  projection-window Hamming matching + motion-only GN
  (ops/matching.py + ops/pose_opt.py);
- TrackReferenceKeyFrame (``:766-808``) = unwindowed ratio matching against the
  reference keyframe + the same GN;
- TrackLocalMap (``:939-983``) = frustum culling + scale-predicted projection
  matching over the covisibility-local point set + GN;
- Relocalization (``:1350-1511``) = place-recognition candidates + batched PnP
  RANSAC (ops/pnp.py), wired once the BoW stage exists.

The keyframe decision c1a/c1b/c1c & c2 (``:986-1070``) is preserved
behaviorally on host scalars.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.models.frame import FrameBuilder, FrameData
from orb_slam_free_space_carving_tpu.ops import ba, matching, pose_opt, triangulation as tri, twoview
from orb_slam_free_space_carving_tpu.utils import camera, lie, timing

from time import perf_counter as _pc

NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3

# Fixed capacity of the local-map point set handed to TrackLocalMap.
LOCAL_POINTS_CAP = 2048


def _array_is_ready(x) -> bool:
    """True if a device array's value can be read without blocking."""
    try:
        return bool(x.is_ready())
    except Exception:
        return True


def _pose_opt_kw(opt_cfg):
    """OptimizerConfig -> optimize_pose kwargs (pose_rounds/pose_iterations/
    chi2 lore flow from config; reference Optimizer.cc:369-371)."""
    if opt_cfg is None:
        return {}
    return dict(chi2_th=opt_cfg.chi2_mono, rounds=opt_cfg.pose_rounds,
                iterations=opt_cfg.pose_iterations,
                chi2_th_stereo=opt_cfg.chi2_stereo)


# ---------------------------------------------------------------------------
# Jitted steps
# ---------------------------------------------------------------------------

@jax.jit
def _match_for_init(feat_a, feat_b, window, max_dist, ratio):
    return matching.search_for_initialization(
        feat_a, feat_b, window=window, max_dist=max_dist, ratio=ratio
    )


@functools.partial(jax.jit, static_argnames=("n_samples",))
def _init_two_view(uv1, uv2, mask, intr, key, n_samples=256):
    return twoview.initialize_two_view(uv1, uv2, mask, intr, key, n_samples=n_samples)


@functools.partial(jax.jit, static_argnames=("opt_cfg",))
def _track_motion_step(pose_pred, pt_xyz, pt_desc, pt_octave, pt_mask, frame_feat,
                       frame_inv_sigma2, intr, radius, scale_factor, wh,
                       opt_cfg=None):
    """Project candidate points, window-match, pose-optimize.

    Returns (pose, feat->point match idx [N], n_inliers).
    """
    xc = lie.se3_apply(pose_pred, pt_xyz)
    uv = camera.project(xc, intr)
    vis = (xc[..., 2] > 0.05) & camera.in_image(uv, wh[0], wh[1]) & pt_mask
    idx, _best = matching.search_by_projection_points(
        uv, pt_octave, pt_desc, vis, frame_feat,
        radius_base=radius, scale_factor=scale_factor,
        max_dist=100.0, ratio=0.9,
    )
    # Build pose-opt problem: one obs per matched point.
    matched = idx >= 0
    sel_feat = jnp.clip(idx, 0, frame_feat.capacity - 1)
    obs_uv = frame_feat.uv_und[sel_feat]
    obs_is2 = frame_inv_sigma2[sel_feat]
    res = pose_opt.optimize_pose(
        pose_pred, pt_xyz, obs_uv, obs_is2, matched, intr,
        **_pose_opt_kw(opt_cfg),
    )
    return res.pose, idx, res.inliers, res.n_inliers


@jax.jit
def _track_localmap_step(pose, pt_xyz, pt_desc, pt_mask, pt_maxdist, pt_normal,
                         already_ids, frame_feat, frame_inv_sigma2,
                         cur_track_pt, intr, scale_factor, n_levels, wh):
    """SearchLocalPoints + pose refinement (``Tracking.cc:939-983,1152-1202``).

    ``already_ids`` are point ids already matched this frame (excluded from the
    new search but included in the final optimization via cur_track_pt).
    """
    ok, uv, z, dist, view_cos = camera.in_frustum(
        pt_xyz, pose, intr, wh[0], wh[1],
        min_dist=None, max_dist=None, normals_w=pt_normal,
        view_cos_limit=0.5,
    )
    vis = ok & pt_mask
    pred_level = camera.predict_scale_level(dist, pt_maxdist, scale_factor, n_levels)
    idx, _ = matching.search_by_projection_points(
        uv, pred_level, pt_desc, vis, frame_feat,
        radius_base=4.0, scale_factor=scale_factor,
        max_dist=50.0, ratio=0.9,
    )
    # Merge: features already bound to a tracked point keep their binding.
    feat_has_pt = cur_track_pt >= 0
    # For each local point p matched to feature f: bind if f unbound.
    sel = jnp.clip(idx, 0, frame_feat.capacity - 1)
    can_bind = (idx >= 0) & ~feat_has_pt[sel]
    return jnp.where(can_bind, idx, -1), vis


@functools.partial(jax.jit, static_argnames=("opt_cfg",))
def _pose_opt_from_bindings(pose, track_pt, pt_xyz_all, frame_feat,
                            frame_inv_sigma2, intr, frame_ur=None, bf=0.0,
                            opt_cfg=None):
    """Final pose optimization over every feature->point binding of the frame.

    ``frame_ur`` (stereo/RGB-D frames) adds the uR residual rows with the
    stereo chi2 threshold (Optimizer.cc:326-373 stereo pose edges)."""
    bound = track_pt >= 0
    sel_pt = jnp.clip(track_pt, 0, pt_xyz_all.shape[0] - 1)
    pts = pt_xyz_all[sel_pt]
    res = pose_opt.optimize_pose(
        pose, pts, frame_feat.uv_und, frame_inv_sigma2, bound, intr,
        ur_obs=frame_ur, bf=bf, **_pose_opt_kw(opt_cfg),
    )
    return res.pose, res.inliers, res.n_inliers


@jax.jit
def _counter_update(ctr_visible, ctr_found, visible_ids, vis_mask,
                    found_ids, found_mask):
    """Tracker-side IncreaseVisible/Found deltas (see MapHost.ctr_*)."""
    M = ctr_visible.shape[0]
    vsafe = jnp.where(vis_mask, visible_ids, M)
    fsafe = jnp.where(found_mask, found_ids, M)
    return (
        ctr_visible.at[vsafe].add(1, mode="drop"),
        ctr_found.at[fsafe].add(1, mode="drop"),
    )


@functools.partial(jax.jit, static_argnames=("iterations",))
def _initial_ba(cam_poses, cam_free, points, point_valid, obs_cam, obs_point,
                obs_uv, obs_is2, obs_mask, intr, iterations=20,
                lm_lambda0=1e-4, lm_lambda_factor=2.0):
    prob = ba.BAProblem(
        cam_poses=cam_poses, cam_free=cam_free, points=points,
        point_valid=point_valid, obs_cam=obs_cam, obs_point=obs_point,
        obs_uv=obs_uv, obs_inv_sigma2=obs_is2, obs_mask=obs_mask,
    )
    return ba.ba_solve(prob, intr, iterations=iterations,
                       lm_lambda0=lm_lambda0,
                       lm_lambda_factor=lm_lambda_factor)


def _local_map_stages(m, feat, frame_is2, pose, track_pt, fallback,
                      local_ids, local_mask, intr, scale_factor, n_levels,
                      wh, opt_cfg, frame_ur=None, bf=0.0, weak=False):
    """TrackLocalMap as TWO match->optimize iterations inside one program.

    Iteration 1 searches with the standard radius (wide when ``fallback`` —
    the in-program analog of the reference's same-frame fallback to
    reference-keyframe tracking, Tracking.cc:334-352, whose points are part
    of the local buffer); iteration 2 re-matches from the REFINED pose with
    the tight radius, catching points the first window missed when the seed
    pose was off.  The Hamming matrix is computed once and reused — the
    second iteration costs only masks, reductions and one GN.

    Returns (pose, track_pt, n_inliers, in_frustum_mask).
    """
    M = m.pt_xyz.shape[0]
    l_xyz = m.pt_xyz[local_ids]
    l_desc = m.pt_desc[local_ids]
    l_valid = m.pt_valid[local_ids] & local_mask
    l_maxd = m.pt_max_dist[local_ids]
    l_norm = m.pt_normal[local_ids]
    dist_lm = matching.hamming_matrix(l_desc, feat.desc)

    # Adaptive window: full-wide on hard fallback; mid-wide when the motion
    # stage was weak (prediction error grows exactly when inliers are few —
    # the reference doubles its search window after relocalization/weak
    # tracking the same way, ORBmatcher th=2*, Tracking.cc:950-960).
    radius1 = jnp.where(fallback, 24.0, jnp.where(weak, 8.0, 4.0))
    max_d1 = jnp.where(fallback, 100.0, 50.0)
    ok_f = jnp.zeros(local_ids.shape, bool)
    for radius_base, max_dist in ((radius1, max_d1), (4.0, 50.0)):
        ok_f, uv_l, z_l, dist_l, _ = camera.in_frustum(
            l_xyz, pose, intr, wh[0], wh[1], normals_w=l_norm,
            view_cos_limit=0.5,
        )
        # Exclude points already bound this frame.
        bound = jnp.zeros((M + 1,), bool).at[
            jnp.where(track_pt >= 0, track_pt, M)
        ].set(True, mode="drop")
        vis_l = ok_f & l_valid & ~bound[jnp.clip(local_ids, 0, M - 1)]
        pred_lv = camera.predict_scale_level(
            dist_l, l_maxd, scale_factor, n_levels
        )
        radii_l = radius_base * scale_factor ** pred_lv.astype(jnp.float32)
        feat_free = track_pt < 0
        mask_l = matching.window_mask(uv_l, feat.uv_und, radii_l, vis_l,
                                      feat.valid & feat_free)
        mask_l = mask_l & matching.octave_mask(pred_lv, feat.octave, -1, 1)
        # Same-level-only Lowe ratio at 0.9 (ORBmatcher.cc:90-105 + the
        # tracking matcher's mfNNratio, Tracking.cc:330): blanket 0.8
        # collapsed the local-map match set to ~20% on the repetitive-
        # texture benchmark scenes and was the root cause of the
        # mid-sequence tracking deaths.
        idx_l, best_l = matching.masked_match(
            dist_lm, mask_l, max_dist=max_dist, ratio=0.9,
            oct_b=feat.octave,
        )
        idx_l = matching._dedup_targets(idx_l, best_l, feat.capacity)
        can_bind = idx_l >= 0
        tgt_l = jnp.where(can_bind, idx_l, feat.capacity)
        track_pt = track_pt.at[tgt_l].set(
            jnp.where(can_bind, local_ids, -1).astype(jnp.int32), mode="drop"
        )
        # Pose GN over every binding; outliers unbind.  Stereo rows
        # (frame_ur) add the uR residual with the stereo chi2 threshold
        # (Optimizer.cc:326-373), exactly like the slow path's final GN.
        bound2 = track_pt >= 0
        sel_pt = jnp.clip(track_pt, 0, M - 1)
        res = pose_opt.optimize_pose(
            pose, m.pt_xyz[sel_pt], feat.uv_und, frame_is2, bound2, intr,
            ur_obs=frame_ur, bf=bf, **_pose_opt_kw(opt_cfg),
        )
        pose = res.pose
        track_pt = jnp.where(res.inliers | ~bound2, track_pt, -1)
    n_inliers = jnp.sum(track_pt >= 0)
    return pose, track_pt, n_inliers, ok_f


@functools.partial(
    jax.jit,
    static_argnames=("orb_cfg", "scale_factor", "n_levels", "wh",
                     "radius_motion", "has_distortion", "opt_cfg",
                     "min_matches"),
)
def _fused_track_step(m, img_u8, last_pose, velocity, last_track_pt,
                      last_octave, local_ids, local_mask, intr,
                      inv_sigma2_by_level, pt_visible, pt_found,
                      orb_cfg, scale_factor, n_levels,
                      wh, radius_motion, has_distortion, opt_cfg=None,
                      min_matches=10):
    """ONE dispatch for the whole per-frame hot path (SURVEY.md section 3.2):

    extract ORB -> constant-velocity predict -> projection match vs the last
    frame's points -> motion-only GN -> local-map frustum + scale-predicted
    match -> GN -> re-match -> GN -> visible/found counter update.

    The reference spreads this over ~6 sequential CPU stages; fusing it into
    one jitted program removes every intermediate host<->device round trip
    (the dominant cost at 17 fps pre-fusion) and lets XLA overlap the matmuls.

    SELF-HEALING: when the motion-model stage fails (< ``min_matches``
    inliers — bad velocity, dropped frame, jitter), the program falls back
    IN-PROGRAM to a wide-window local-map search seeded at the last frame's
    pose — the device analog of the reference's same-frame fallback to
    TrackReferenceKeyFrame (Tracking.cc:334-352; the reference keyframe's
    points are part of the local buffer).  Host-side recovery (which costs a
    ~168 ms slow-path round trip) is only needed when this fails too.

    ``pt_visible``/``pt_found`` are the TRACKER-owned counter arrays
    (MapPoint::IncreaseVisible/Found are tracking-side in the reference too):
    keeping them outside the shared map pytree means tracking never writes the
    map cell, which is what lets the mapping stage run on its own thread
    (P1/P2 of SURVEY section 2.4) without write-write races.

    Returns (feat, frame_is2, pose, track_pt, n_inliers, velocity,
    pt_visible', pt_found').
    """
    from orb_slam_free_space_carving_tpu.ops import orb as orb_ops

    # --- frame build
    feat = orb_ops.extract_features(img_u8, orb_cfg)
    if has_distortion:
        uv_und = camera.undistort_pixels(feat.xy, intr)
    else:
        uv_und = feat.xy
    feat = feat._replace(uv_und=uv_und)
    frame_is2 = inv_sigma2_by_level[jnp.clip(feat.octave, 0, n_levels - 1)]
    return _track_core(
        m, feat, frame_is2, last_pose, velocity, last_track_pt, last_octave,
        local_ids, local_mask, intr, pt_visible, pt_found,
        scale_factor, n_levels, wh, radius_motion, opt_cfg, min_matches,
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale_factor", "n_levels", "wh", "radius_motion",
                     "opt_cfg", "min_matches", "bf", "th_depth"),
)
def _fused_track_step_frame(m, feat, frame_is2, frame_ur, frame_depth,
                            last_pose, velocity, last_track_pt, last_octave,
                            local_ids, local_mask, intr, pt_visible, pt_found,
                            scale_factor, n_levels, wh, radius_motion,
                            opt_cfg=None, min_matches=10, bf=0.0,
                            th_depth=0.0):
    """Fused per-frame hot path over an ALREADY-BUILT frame (stereo/RGB-D):
    same motion -> local-map -> counters chain as :func:`_fused_track_step`
    with the stereo uR residual rows in every pose GN, plus the close-point
    pressure counts the stereo keyframe policy needs (Tracking.cc:1010-1026)
    computed in-program so the lagged decision readback stays scalar.

    Returns (pose, track_pt, n_inliers, velocity, pt_visible', pt_found',
    tracked_close, untracked_close).
    """
    (pose, track_pt, n_inliers, velocity, pt_visible, pt_found
     ) = _track_core(
        m, feat, frame_is2, last_pose, velocity, last_track_pt, last_octave,
        local_ids, local_mask, intr, pt_visible, pt_found,
        scale_factor, n_levels, wh, radius_motion, opt_cfg, min_matches,
        frame_ur=frame_ur, bf=bf,
    )[2:]
    close = (frame_depth > 0) & (frame_depth < th_depth) & feat.valid
    tracked_close = jnp.sum(close & (track_pt >= 0))
    untracked_close = jnp.sum(close & (track_pt < 0))
    return (pose, track_pt, n_inliers, velocity, pt_visible, pt_found,
            tracked_close, untracked_close)


def _track_core(m, feat, frame_is2, last_pose, velocity, last_track_pt,
                last_octave, local_ids, local_mask, intr, pt_visible,
                pt_found, scale_factor, n_levels, wh, radius_motion,
                opt_cfg, min_matches, frame_ur=None, bf=0.0):
    """Motion-model + local-map tracking core shared by the mono and
    stereo/RGB-D fused steps (everything below extraction)."""
    M = m.pt_xyz.shape[0]

    # --- motion model match + pose GN
    pose_pred = lie.se3_compose(velocity, last_pose)
    cand = last_track_pt >= 0
    pt_ids = jnp.where(cand, last_track_pt, 0)
    pt_xyz = m.pt_xyz[pt_ids]
    pt_desc = m.pt_desc[pt_ids]
    pt_valid = m.pt_valid[pt_ids] & cand
    xc = lie.se3_apply(pose_pred, pt_xyz)
    uv = camera.project(xc, intr)
    vis_m = (xc[..., 2] > 0.05) & camera.in_image(uv, wh[0], wh[1]) & pt_valid
    # Predicted octave per candidate: the detection level of the feature that
    # observed the point in the last frame (SearchByProjection frame-vs-
    # lastframe uses the same lastframe-octave window, ORBmatcher.cc:1395-).
    radii = radius_motion * scale_factor ** last_octave.astype(jnp.float32)
    dist_m = matching.hamming_matrix(pt_desc, feat.desc)
    mask_m = matching.window_mask(uv, feat.uv_und, radii, vis_m, feat.valid)
    mask_m = mask_m & matching.octave_mask(last_octave, feat.octave, -1, 1)
    idx_m, best_m = matching.masked_match(dist_m, mask_m, max_dist=100.0,
                                          ratio=0.9, oct_b=feat.octave)
    idx_m = matching._dedup_targets(idx_m, best_m, feat.capacity)
    matched_m = idx_m >= 0
    sel_feat = jnp.clip(idx_m, 0, feat.capacity - 1)
    res1 = pose_opt.optimize_pose(
        pose_pred, pt_xyz, feat.uv_und[sel_feat], frame_is2[sel_feat],
        matched_m, intr,
        ur_obs=None if frame_ur is None else frame_ur[sel_feat], bf=bf,
        **_pose_opt_kw(opt_cfg),
    )

    # In-program fallback decision (Tracking.cc:334-352 semantics): too few
    # motion inliers -> discard the motion result, seed the local-map stage
    # at the last frame's pose with a wide window.
    ok_motion = res1.n_inliers >= min_matches
    pose = jnp.where(ok_motion, res1.pose, last_pose)

    # track_pt: feature slot -> global point id from the motion match.
    ok_m = matched_m & res1.inliers & ok_motion
    src_pid = jnp.where(ok_m, last_track_pt, M)       # M = dropped
    tgt = jnp.where(ok_m, idx_m, feat.capacity)
    track_pt = jnp.full((feat.capacity,), -1, jnp.int32).at[tgt].set(
        src_pid.astype(jnp.int32), mode="drop"
    )
    track_pt = jnp.where(track_pt == M, -1, track_pt)

    # --- local map: two match->optimize iterations (wide on fallback,
    # mid-wide when motion inliers were thin)
    weak = res1.n_inliers < 60
    pose, track_pt, n_inliers, ok_f = _local_map_stages(
        m, feat, frame_is2, pose, track_pt, ~ok_motion,
        local_ids, local_mask, intr, scale_factor, n_levels, wh, opt_cfg,
        frame_ur=frame_ur, bf=bf, weak=weak,
    )

    # --- counters: visible (in frustum) & found (tracked) per local point
    l_valid = m.pt_valid[local_ids] & local_mask
    vis_ids = jnp.where(ok_f & l_valid, local_ids, M)
    found_sel = jnp.where(track_pt >= 0, track_pt, M)
    pt_visible = pt_visible.at[vis_ids].add(1, mode="drop")
    pt_found = pt_found.at[found_sel].add(1, mode="drop")
    # Constant-velocity model update on device (Tracking.cc:451-459) — keeps
    # the velocity out of the host round-trip loop entirely.
    velocity = lie.se3_compose(pose, lie.se3_inverse(last_pose))
    return (feat, frame_is2, pose, track_pt, n_inliers, velocity,
            pt_visible, pt_found)


@functools.partial(jax.jit, static_argnames=("cap",))
def _nearby_point_ids(pt_xyz, pt_valid, pose, cap):
    """Top-``cap`` valid map points nearest the camera center — the buffer
    fallback when covisibility rows are thin (async keyframe bursts leave
    observation rows sparse until triangulation/fuse land; a 57-point buffer
    on a 1000-point map was the measured recovery killer)."""
    center = lie.se3_inverse(pose)[4:7]
    d = jnp.linalg.norm(pt_xyz - center[None, :], axis=-1)
    d = jnp.where(pt_valid, d, jnp.inf)
    _, ids = jax.lax.top_k(-d, cap)
    ids = ids.astype(jnp.int32)
    return ids, pt_valid[ids]


@functools.partial(
    jax.jit,
    static_argnames=("scale_factor", "n_levels", "wh", "opt_cfg"),
)
def _fused_recover_step(m, feat, frame_is2, seed_pose, local_ids, local_mask,
                        intr, scale_factor, n_levels, wh, opt_cfg=None):
    """Re-track an ALREADY-EXTRACTED frame from a seed pose in one dispatch.

    Used by the pipelined-decision recovery path: when a lagged decision
    discovers a failed frame, the frame's features are still on device, so
    recovery = wide local-map search from the last confirmed-good pose +
    two match->optimize iterations — one program, one scalar readback,
    instead of the old host-orchestrated ref-KF + local-map chain (~6
    round trips over the tunnel).
    """
    track_pt = jnp.full((feat.capacity,), -1, jnp.int32)
    pose, track_pt, n_inliers, _ = _local_map_stages(
        m, feat, frame_is2, seed_pose, track_pt, jnp.bool_(True),
        local_ids, local_mask, intr, scale_factor, n_levels, wh, opt_cfg,
        weak=jnp.bool_(True),
    )
    return pose, track_pt, n_inliers


# ---------------------------------------------------------------------------
# Tracker
# ---------------------------------------------------------------------------

class Tracker:
    def __init__(self, cfg: SystemConfig, map_arrays_ref, map_host: ms.MapHost,
                 local_mapper=None, relocalizer=None, runner=None):
        self.cfg = cfg
        self.builder = FrameBuilder(cfg)
        self._init_builder = None      # 2x-budget builder, built on demand
        self.intr = camera.intrinsics_array(cfg.camera)
        self.wh = (cfg.camera.width, cfg.camera.height)
        self._map_ref = map_arrays_ref      # single-element list (shared cell)
        self.host = map_host
        self.local_mapper = local_mapper
        self.relocalizer = relocalizer

        self.state = NO_IMAGES_YET
        # Localization-only latch (System.cc:293-303 / Tracking.cc:986-991):
        # when set, _need_new_keyframe always returns False so the map is
        # never grown; motion/ref-KF/local-map tracking still runs.
        self.only_tracking = False
        # System::Reset hook for the early-lost auto-reset
        # (Tracking.cc:480-489: lost with <=5 keyframes right after
        # initialization -> full reset + re-initialize).
        self.reset_cb = None
        self.key = jax.random.PRNGKey(cfg.seed)
        self.velocity = None                 # [7] relative pose T_cur_last (np)
        self._velocity_dev = None            # [7] device mirror (fast path)
        self.last_frame: Optional[FrameData] = None
        self.last_track_pt: Optional[np.ndarray] = None   # [N] point ids
        self.init_frame: Optional[FrameData] = None
        self.ref_kf: int = -1
        self.last_kf_frame_idx = -1
        self.frame_idx = -1
        self.trajectory = []                 # (timestamp, pose7 np-or-device, state)
        self.n_tracked = 0
        # Lagged fast-path decision state: per-frame inlier counts are read
        # back up to ``decision_batch-1`` frames late so one device->host
        # sync amortizes over the batch (the TPU tunnel has a variable
        # 0-30 ms RTT floor per sync, scripts/probe_floor*).  Entries:
        # (frame, track_pt, n_inl, timestamp, frame_idx).
        self._pending: list = []
        # Deep decision pipelining only pays on a high-latency device link
        # (the async runtime); in deterministic mode decisions must be prompt
        # (reference semantics: loss detected within ~1 frame), so the
        # blocking bound is capped at 2.
        det = runner is None or runner.deterministic
        self._decision_batch = (
            min(2, max(1, cfg.tracking.decision_batch)) if det
            else max(1, cfg.tracking.decision_batch)
        )
        self._force_slow = False
        self._stale_pending = 0
        self._degraded = 0       # consecutive low-inlier frames (async bridge)
        self._reloc_fails = 0    # consecutive failed reloc attempts (backoff)
        # The degraded bridge only exists to span ASYNC worker lag; in
        # deterministic mode mapping is inline (no lag) and the reference's
        # immediate <30 -> LOST semantics hold (tests rely on them).
        self._degraded_budget = (
            cfg.tracking.max_degraded_frames
            if runner is not None and not runner.deterministic else 0
        )
        # Pose of the most recent frame whose inlier decision confirmed OK:
        # the seed for same-frame fallback re-tracking when a lagged decision
        # discovers a failure (reference Tracking.cc:334-352 falls back to
        # reference-KF tracking within the same frame; with pipelined
        # decisions the "same frame" is re-tracked here from this pose).
        self._last_good_pose = None
        self._last_refresh_frame = -10**9
        # Async stage runtime (None or a StageRunner; deterministic = inline).
        self.runner = runner
        self._ref_kf_frame: Optional[FrameData] = None
        self._map_jump_kf = -1               # set by the worker on loop/GBA
        # Device-resident fast-path state (refreshed on keyframe events).
        cap_l = LOCAL_POINTS_CAP
        self._local_ids = jnp.zeros((cap_l,), jnp.int32)
        self._local_mask = jnp.zeros((cap_l,), bool)
        self._local_ids_np = np.zeros((cap_l,), np.int32)
        self._local_mask_np = np.zeros((cap_l,), bool)
        self._track_pt_dev = None            # [N] int32 on device
        self._inv_sigma2_lv = jnp.asarray(
            1.0 / np.array(cfg.orb.level_sigma2, np.float32)
        )
        # Fused-path optimizer budget (see OptimizerConfig.pose_iterations_fused).
        import dataclasses

        self._fused_opt_cfg = dataclasses.replace(
            cfg.optimizer, pose_iterations=cfg.optimizer.pose_iterations_fused
        )

    @property
    def m(self) -> ms.MapArrays:
        return self._map_ref[0]

    @m.setter
    def m(self, v):
        self._map_ref[0] = v

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    # ------------------------------------------------------------------
    def track(self, img: np.ndarray, timestamp: float) -> np.ndarray:
        """Process one frame; returns pose7 Tcw or identity if lost.

        The returned pose may be a device array (fast path) — it converts to
        numpy on demand; the trajectory is materialized in one batched
        transfer by :meth:`finalize_trajectory`."""
        self.frame_idx += 1
        # Apply any point-replacement counter merges queued by the worker
        # (tracker = single writer of host.ctr_*; see MapHost.queue_ctr_merge).
        self.host.drain_ctr_merges()

        if self._map_jump_kf >= 0:
            # The worker closed a loop / ran GBA: re-anchor on the corrected
            # keyframe pose and re-track via the slow path (see _on_map_jump).
            jump_kf, self._map_jump_kf = self._map_jump_kf, -1
            self._pending = []              # computed against the old map
            if self.last_frame is not None:
                self.last_frame = self.last_frame._replace(
                    pose=self.m.kf_pose[jump_kf]
                )
            self.velocity = None
            self._velocity_dev = None
            self._force_slow = True

        have_vel = self._velocity_dev is not None or self.velocity is not None
        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            self._flush_pending()
            frame = self._build_init_frame(img)
            self._monocular_initialization(frame, timestamp)
        elif (self.state == OK and have_vel
              and self._track_pt_dev is not None and not self._force_slow):
            with timing.span("track.h2d"):
                img_dev = jnp.asarray(img, jnp.uint8)
            self._track_frame_fast(img_dev, timestamp)
        else:
            with timing.span("track.slow_path"):
                self._flush_pending()
                self._force_slow = False
                frame = self.builder(img)
                self._track_frame(frame, timestamp)

        # Early-lost auto-reset (Tracking.cc:480-489): losing the camera
        # with <=5 keyframes means the bootstrap geometry was bad; a full
        # reset lets the next frames re-initialize instead of relocalizing
        # forever against a garbage 2-KF map.
        # (skipped in localization-only mode: resetting would wipe a loaded
        # map the user explicitly asked to localize against).
        if (self.state == LOST and self.reset_cb is not None
                and self.cfg.tracking.reset_on_early_lost
                and not self.only_tracking
                and int(self.host.kf_valid.sum()) <= 5):
            self.trajectory.append((timestamp, lie.se3_identity(), LOST))
            self.reset_cb()
            return np.asarray(lie.se3_identity())

        pose = (
            self.last_frame.pose if self.last_frame is not None
            else lie.se3_identity()
        )
        self.trajectory.append((timestamp, pose, self.state))
        return pose

    def finalize_trajectory(self):
        """Materialize any device-resident trajectory poses in ONE transfer."""
        if not self.trajectory:
            return
        poses = jnp.stack([p for _, p, _ in self.trajectory])
        poses_np = np.asarray(poses)
        self.trajectory = [
            (t, poses_np[i], s) for i, (t, _, s) in enumerate(self.trajectory)
        ]

    # ------------------------------------------------------------------
    # Stereo / RGB-D entries (Tracking::GrabImageStereo/GrabImageRGBD)
    # ------------------------------------------------------------------
    def track_stereo(self, img_l: np.ndarray, img_r: np.ndarray,
                     timestamp: float) -> np.ndarray:
        self.frame_idx += 1
        frame = self.builder.stereo(img_l, img_r)
        return self._track_with_depth(frame, timestamp)

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> np.ndarray:
        self.frame_idx += 1
        frame = self.builder.rgbd(img, depth)
        return self._track_with_depth(frame, timestamp)

    def _track_with_depth(self, frame: FrameData, timestamp: float):
        """Stereo/RGB-D per-frame entry: the same async fused fast path as
        monocular (frame build = 1 dispatch, tracking = 1 dispatch, lagged
        scalar decisions) with stereo uR residuals and in-program close-point
        counts; falls back to the host-orchestrated slow path on trouble."""
        self.host.drain_ctr_merges()
        if self._map_jump_kf >= 0:
            jump_kf, self._map_jump_kf = self._map_jump_kf, -1
            self._pending = []
            if self.last_frame is not None:
                self.last_frame = self.last_frame._replace(
                    pose=self.m.kf_pose[jump_kf]
                )
            self.velocity = None
            self._velocity_dev = None
            self._force_slow = True

        have_vel = self._velocity_dev is not None or self.velocity is not None
        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            self._flush_pending()
            self._stereo_initialization(frame, timestamp)
        elif (self.state == OK and have_vel
              and self._track_pt_dev is not None and not self._force_slow):
            self._track_frame_fast_depth(frame, timestamp)
        else:
            with timing.span("track.slow_path"):
                self._flush_pending()
                self._force_slow = False
                self._track_frame(frame, timestamp)

        if (self.state == LOST and self.reset_cb is not None
                and self.cfg.tracking.reset_on_early_lost
                and not self.only_tracking
                and int(self.host.kf_valid.sum()) <= 5):
            self.trajectory.append((timestamp, lie.se3_identity(), LOST))
            self.reset_cb()
            return np.asarray(lie.se3_identity())

        pose = (
            self.last_frame.pose if self.last_frame is not None
            else lie.se3_identity()
        )
        self.trajectory.append((timestamp, pose, self.state))
        return pose

    def _track_frame_fast_depth(self, frame: FrameData, timestamp: float):
        if self._velocity_dev is None:
            self._velocity_dev = jnp.asarray(self.velocity)
        t0 = _pc()
        (pose, track_pt, n_inl, vel, ctr_vis, ctr_fnd, tc, uc
         ) = _fused_track_step_frame(
            self.m, frame.feat, frame.inv_sigma2, frame.u_right, frame.depth,
            self.last_frame.pose, self._velocity_dev, self._track_pt_dev,
            self.last_frame.feat.octave, self._local_ids, self._local_mask,
            self.intr, self.host.ctr_visible, self.host.ctr_found,
            self.cfg.orb.scale_factor, self.cfg.orb.n_levels, self.wh,
            self.cfg.matcher.search_radius_motion,
            opt_cfg=self._fused_opt_cfg,
            min_matches=self.cfg.tracking.min_matches_track,
            bf=self.cfg.camera.bf, th_depth=self.cfg.camera.th_depth_m,
        )
        timing.add("track.fast_dispatch", _pc() - t0)
        timing.count("dispatch.track_fast_depth", 2)
        try:
            n_inl.copy_to_host_async()
            track_pt.copy_to_host_async()
        except Exception:
            pass
        frame = frame._replace(pose=pose)

        self.host.ctr_visible = ctr_vis
        self.host.ctr_found = ctr_fnd
        self._velocity_dev = vel
        self._track_pt_dev = track_pt
        self.last_frame = frame

        self._pending.append(
            (frame, track_pt, n_inl, timestamp, self.frame_idx, (tc, uc))
        )
        with timing.span("track.finalize"):
            while self._pending and (
                len(self._pending) >= self._decision_batch
                or _array_is_ready(self._pending[0][2])
            ):
                self._finalize_pending(self._pending.pop(0))
                if self._force_slow:
                    break

    def _stereo_initialization(self, frame: FrameData, timestamp: float):
        """StereoInitialization (Tracking.cc:518-570): with >=500 features the
        first frame becomes a keyframe at the origin and every feature with a
        stereo/RGB-D depth unprojects to a map point — metric scale from the
        first frame, no two-view bootstrap needed."""
        n_valid = int(jnp.sum(frame.feat.valid))
        if n_valid < 500:
            self.last_frame = frame
            self.state = NOT_INITIALIZED
            return

        depth_np = np.asarray(frame.depth)
        valid_np = np.asarray(frame.feat.valid)
        feats = np.where((depth_np > 0) & valid_np)[0]
        if feats.size < 50:
            self.last_frame = frame
            self.state = NOT_INITIALIZED
            return

        kf = self.host.alloc_keyframe()
        pids = self.host.alloc_points(feats.size)
        N = frame.feat.capacity
        obs = np.full(N, -1, np.int32)
        obs[feats] = pids
        self.host.obs_pt[kf] = obs
        self.host.kf_frame_id[kf] = self.frame_idx
        self.host.kf_timestamp[kf] = timestamp

        uv_np = np.asarray(frame.feat.uv_und)[feats]
        d = depth_np[feats]
        cam = self.cfg.camera
        xyz = np.stack([
            (uv_np[:, 0] - cam.cx) / cam.fx * d,
            (uv_np[:, 1] - cam.cy) / cam.fy * d,
            d,
        ], axis=-1).astype(np.float32)      # pose = identity: camera == world

        f = frame.feat
        m = ms.insert_keyframe_arrays(
            self.m, kf, lie.se3_identity(), f.uv_und, f.octave, f.angle,
            f.desc, f.valid, jnp.asarray(obs), ur_row=frame.u_right,
        )
        sf = self.cfg.orb.scale_factor
        oct_np = np.asarray(f.octave)[feats]
        dist = np.linalg.norm(xyz, axis=-1)
        max_dist = dist * (sf ** oct_np)
        min_dist = max_dist / (sf ** (self.cfg.orb.n_levels - 1))
        normal = xyz / np.maximum(dist[:, None], 1e-9)
        m = ms.add_points_arrays(
            m, jnp.asarray(pids), jnp.asarray(xyz),
            f.desc[jnp.asarray(feats)], jnp.asarray(normal, jnp.float32),
            jnp.asarray(min_dist, jnp.float32), jnp.asarray(max_dist, jnp.float32),
            jnp.full(feats.size, kf, jnp.int32), jnp.full(feats.size, kf, jnp.int32),
            jnp.ones(feats.size, bool),
        )
        self.m = m

        self.host.update_covisibility(kf)
        self.host.journal.append(ms.JournalEvent(
            kind="keyframe", kf=kf, cam_center=np.zeros(3),
            new_points=xyz.astype(np.float64), new_point_ids=pids.astype(np.int64),
            vis_ids=pids.copy(),
        ))

        track_pt = obs.copy()
        self.last_track_pt = track_pt
        self._track_pt_dev = jnp.asarray(track_pt)
        self.last_frame = frame._replace(pose=lie.se3_identity())
        self.ref_kf = kf
        self.last_kf_frame_idx = self.frame_idx
        self.velocity = None
        self.state = OK
        self.n_tracked = feats.size
        if self.local_mapper is not None:
            self.local_mapper.on_keyframe(kf)
        self._refresh_local_points()

    # ------------------------------------------------------------------
    # Fused fast path: one device dispatch per frame, decisions lagged one
    # frame so the scalar readback overlaps the next frame's work.
    # ------------------------------------------------------------------
    def _track_frame_fast(self, img_dev, timestamp: float):
        if self._velocity_dev is None:
            self._velocity_dev = jnp.asarray(self.velocity)
        t0 = _pc()
        (feat, frame_is2, pose, track_pt, n_inl, vel,
         ctr_vis, ctr_fnd) = _fused_track_step(
            self.m, img_dev, self.last_frame.pose, self._velocity_dev,
            self._track_pt_dev, self.last_frame.feat.octave,
            self._local_ids, self._local_mask,
            self.intr, self._inv_sigma2_lv,
            self.host.ctr_visible, self.host.ctr_found,
            self.cfg.orb, self.cfg.orb.scale_factor, self.cfg.orb.n_levels,
            self.wh, self.cfg.matcher.search_radius_motion,
            self.cfg.camera.has_distortion, opt_cfg=self._fused_opt_cfg,
            min_matches=self.cfg.tracking.min_matches_track,
        )
        timing.add("track.fast_dispatch", _pc() - t0)
        # Dispatch accounting (BENCH_DETAIL "events"): the fast path costs
        # exactly 2 device programs per frame (h2d + fused step) + 1 async
        # readback; at the tunnel's ~2 ms dispatch floor this is the budget
        # that makes high fps possible at all.
        timing.count("dispatch.track_fast", 2)
        try:
            n_inl.copy_to_host_async()
            # Keyframe creation pulls track_pt on the host; starting the
            # copy now means the pull doesn't stall behind queued compute
            # (~45 ms measured on the tunnel).
            track_pt.copy_to_host_async()
        except Exception:
            pass
        frame = FrameData(feat=feat, pose=pose, inv_sigma2=frame_is2)

        # Optimistically advance device-resident state; the pending frame's
        # inlier count is examined next frame (or at flush).
        self.host.ctr_visible = ctr_vis
        self.host.ctr_found = ctr_fnd
        self._velocity_dev = vel
        self._track_pt_dev = track_pt
        self.last_frame = frame

        self._pending.append(
            (frame, track_pt, n_inl, timestamp, self.frame_idx, None)
        )
        # Finalize every pending frame whose inlier readback has already
        # landed (is_ready() => int() is free): in practice the async copy
        # completes during the next frame's work, so decisions lag ~1 frame
        # like the reference while never blocking.  decision_batch is only
        # the *blocking* bound — the queue never grows past it.
        with timing.span("track.finalize"):
            while self._pending and (
                len(self._pending) >= self._decision_batch
                or _array_is_ready(self._pending[0][2])
            ):
                self._finalize_pending(self._pending.pop(0))
                if self._force_slow:
                    break

    def _finalize_pending(self, pending):
        """Apply the lagged per-frame decisions (tracking health + keyframe
        policy) for a previously dispatched frame."""
        frame, track_pt, n_inl, timestamp, frame_idx, close = pending
        n = int(n_inl)           # transfer started last frame; ~0 wait
        tcfg = self.cfg.tracking
        if n < tcfg.min_matches_track:
            # The fused dispatch (incl. its in-program wide fallback) failed
            # hard.  The reference falls back to reference-KF tracking WITHIN
            # the same frame (Tracking.cc:334-352); with pipelined decisions
            # the frame data is still held here, so re-track it now from the
            # last pose the decision loop confirmed good.
            self._recover_pending(frame, timestamp, frame_idx)
            return
        if n < tcfg.min_matches_track_localmap:
            # Degraded bridge (see TrackingConfig.max_degraded_frames): the
            # pose is still well-constrained; keep tracking while the worker
            # catches up with triangulation for the new viewpoint.
            self._degraded += 1
            timing.count("track.degraded")
            if self._degraded > self._degraded_budget:
                self._recover_pending(frame, timestamp, frame_idx)
                return
        else:
            self._degraded = 0
        self.state = OK
        self.n_tracked = n
        self._last_good_pose = frame.pose
        if self._stale_pending > 0:
            self._stale_pending -= 1
            return
        # Local-map staleness guard: the device-side point buffer refreshes
        # on keyframe events; between keyframes the reference recomputes its
        # local map per frame (Tracking.cc:1204-1348).  When the inlier count
        # decays toward the loss threshold, recompute the buffer from the
        # currently tracked points before the fused path actually fails.
        # Cooldown: the host scan costs tens of ms, and a borderline inlier
        # count would otherwise trigger it every frame.
        if (n < 2 * self.cfg.tracking.min_matches_track_localmap
                and frame_idx - self._last_refresh_frame >= 5):
            with timing.span("track.local_refresh"):
                self._last_refresh_frame = frame_idx
                tp_np = np.asarray(track_pt)
                ids, msk = self._local_point_ids(tp_np)
                self._local_ids_np, self._local_mask_np = ids, msk
                self._local_ids = jnp.asarray(ids)
                self._local_mask = jnp.asarray(msk)
        close_counts = None
        if close is not None:
            close_counts = (int(close[0]), int(close[1]))
        if self._need_new_keyframe(n, close_counts=close_counts):
            with timing.span("track.create_kf"):
                # track_pt stays on device: the worker pulls it when it
                # processes the keyframe, so the tracking thread never waits
                # for the device queue to drain here.
                self.last_track_pt = track_pt
                saved_idx = self.frame_idx
                self.frame_idx = frame_idx  # keyframe carries its own frame id
                self._create_new_keyframe(frame, timestamp, track_pt)
                self.frame_idx = saved_idx

    def _recover_pending(self, frame: FrameData, timestamp: float,
                         frame_idx: int):
        """Hard-failed pipelined frame (the in-program fallback of the fused
        step failed too): refresh the local buffer from host covisibility
        (stale buffers are the usual root cause), then re-track this frame
        AND every remaining pending frame — each ONE fused dispatch over the
        already-extracted features — and resume the fast path from the
        recovered state.  The old path forced the next frames through the
        ~168 ms host-orchestrated slow path; this one costs ~1 dispatch +
        1 scalar readback per suspect frame and never leaves the fast path.

        On unrecoverable frames the trajectory entries are marked LOST and
        the tracker falls back to the slow path (relocalization)."""
        timing.count("track.recover_chain")
        self._refresh_local_points()
        chain = [(frame, timestamp, frame_idx)]
        chain += [(f, ts, fi) for (f, _tp, _n, ts, fi, _c) in self._pending]
        self._pending = []
        seed = self._last_good_pose
        if seed is None and self.last_frame is not None:
            seed = self.last_frame.pose
        prev_pose = seed
        for i, (f, ts, fi) in enumerate(chain):
            pose, track_pt, n_inl = _fused_recover_step(
                self.m, f.feat, f.inv_sigma2, prev_pose,
                self._local_ids, self._local_mask, self.intr,
                self.cfg.orb.scale_factor, self.cfg.orb.n_levels, self.wh,
                opt_cfg=self._fused_opt_cfg,
            )
            timing.count("dispatch.track_recover")
            n2 = int(n_inl)
            if n2 >= self.cfg.tracking.min_matches_track_localmap:
                self._degraded = 0
            elif (n2 >= self.cfg.tracking.min_matches_track
                    and self._degraded <= self._degraded_budget):
                # Recovered into the degraded band: bridge (see
                # _finalize_pending) instead of LOST.
                self._degraded += 1
                timing.count("track.degraded")
            if n2 < self.cfg.tracking.min_matches_track:
                # Last resort before LOST: full relocalization on this frame
                # (the BoW database covers the CURRENT place — when tracking
                # collapses from accumulated drift rather than occlusion,
                # reloc re-anchors in one shot instead of waiting out a
                # revisit).  Features are already extracted.
                if self.relocalizer is not None:
                    r_ok, r_tp, r_pose = self.relocalizer.relocalize(f)
                    if r_ok:
                        timing.count("recover.via_reloc")
                        pose2, tp2, n3 = _fused_recover_step(
                            self.m, f.feat, f.inv_sigma2, jnp.asarray(r_pose),
                            self._local_ids, self._local_mask, self.intr,
                            self.cfg.orb.scale_factor, self.cfg.orb.n_levels,
                            self.wh, opt_cfg=self._fused_opt_cfg,
                        )
                        if int(n3) >= self.cfg.tracking.min_matches_track:
                            pose, track_pt, n2 = pose2, tp2, int(n3)
                            self._degraded += 1
                            # The chain's previous pose is pre-jump: velocity
                            # across it would catapult the next prediction.
                            prev_pose = None
                            self._velocity_dev = None
                            self.velocity = None
                            # Re-anchor ref_kf on the relocalized place.
                            tp_np = np.asarray(tp2)
                            seen = tp_np[tp_np >= 0]
                            if seen.size:
                                from orb_slam_free_space_carving_tpu.runtime \
                                    import mapstore

                                hits = mapstore.kfs_observing(
                                    self.host.obs_pt[: self.host.n_kf_slots],
                                    self.host.kf_valid[: self.host.n_kf_slots]
                                    .astype(np.uint8),
                                    seen.astype(np.int32),
                                    self.cfg.capacity.max_points, cap=1,
                                )
                                if hits.size:
                                    self.ref_kf = int(hits[0])
                                    self._ref_kf_frame = None
                            self._refresh_local_points()
            if n2 < self.cfg.tracking.min_matches_track or (
                    n2 < self.cfg.tracking.min_matches_track_localmap
                    and self._degraded > self._degraded_budget):
                # Unrecoverable: LOST from this frame on; the slow path
                # (relocalization) takes over at the next track() call.
                timing.count("recover.lost")
                import os as _os

                if _os.environ.get("OSFSC_DEBUG"):
                    import sys as _sys

                    seedp = prev_pose if prev_pose is not None else f.pose
                    ids = self._local_ids
                    msk = np.asarray(self._local_mask)
                    ok_f, uv_l, z_l, d_l, _ = camera.in_frustum(
                        self.m.pt_xyz[ids], jnp.asarray(seedp), self.intr,
                        self.wh[0], self.wh[1],
                    )
                    okf = np.asarray(ok_f) & msk & np.asarray(
                        self.m.pt_valid[ids])
                    dist = matching.hamming_matrix(
                        self.m.pt_desc[ids], f.feat.desc)
                    dmin = np.asarray(jnp.min(jnp.where(
                        jnp.asarray(okf)[:, None] & f.feat.valid[None, :],
                        dist, 1e9), axis=1))
                    close = dmin[okf] <= 50 if okf.any() else np.zeros(0)
                    # Per-gate pass counts mirroring _local_map_stages'
                    # fallback iteration (radius 24, view_cos 0.5, octave
                    # +-1): which gate is throwing away the matches?
                    seedj = jnp.asarray(seedp)
                    okn, uvl, _zl, dl, vc = camera.in_frustum(
                        self.m.pt_xyz[ids], seedj, self.intr,
                        self.wh[0], self.wh[1],
                        normals_w=self.m.pt_normal[ids],
                        view_cos_limit=0.5,
                    )
                    okn_np = np.asarray(okn) & okf
                    lvl = camera.predict_scale_level(
                        dl, self.m.pt_max_dist[ids],
                        self.cfg.orb.scale_factor, self.cfg.orb.n_levels)
                    radii = 24.0 * self.cfg.orb.scale_factor ** np.asarray(
                        lvl, np.float32)
                    wm = matching.window_mask(
                        uvl, f.feat.uv_und, jnp.asarray(radii),
                        jnp.asarray(okn_np), f.feat.valid)
                    om = matching.octave_mask(lvl, f.feat.octave, -1, 1)
                    both = np.asarray(wm)
                    botho = both & np.asarray(om)
                    d_w = np.where(both, np.asarray(dist), 1e9)
                    d_wo = np.where(botho, np.asarray(dist), 1e9)
                    # Mirror of iteration 1 of _local_map_stages (fallback):
                    # ratio test + dedup + pose GN — which step zeroes it?
                    idx_l, best_l = matching.masked_match(
                        jnp.asarray(dist), jnp.asarray(botho),
                        max_dist=100.0, ratio=0.9, oct_b=f.feat.octave)
                    idx_l = matching._dedup_targets(
                        idx_l, best_l, f.feat.capacity)
                    bound = np.asarray(idx_l) >= 0
                    sel = jnp.clip(idx_l, 0, f.feat.capacity - 1)
                    resd = pose_opt.optimize_pose(
                        seedj, self.m.pt_xyz[ids], f.feat.uv_und[sel],
                        f.inv_sigma2[sel], jnp.asarray(bound), self.intr,
                        **_pose_opt_kw(self._fused_opt_cfg),
                    )
                    print(f"[osfsc] recover LOST at frame {fi}: n={n2}, "
                          f"kfs={int(self.host.kf_valid.sum())} "
                          f"buf={int(msk.sum())} infrustum={int(okf.sum())} "
                          f"descmatch<=50={int(close.sum())} "
                          f"viewcos={int(okn_np.sum())} "
                          f"window={int(both.any(1).sum())} "
                          f"win+desc={int((d_w.min(1) <= 100).sum())} "
                          f"win+oct+desc={int((d_wo.min(1) <= 100).sum())} "
                          f"ratio+dedup={int(bound.sum())} "
                          f"gn_inl={int(resd.n_inliers)}",
                          file=_sys.stderr, flush=True)
                self.state = LOST
                for (_f2, _ts2, fi2) in chain[i:]:
                    if fi2 < len(self.trajectory):
                        ts_e, pose_e, _ = self.trajectory[fi2]
                        self.trajectory[fi2] = (ts_e, pose_e, LOST)
                self.velocity = None
                self._velocity_dev = None
                self._force_slow = True
                if self.last_frame is not None and seed is not None:
                    # Seed any later slow-path attempt from the sane pose,
                    # not the diverged optimistic chain.
                    self.last_frame = self.last_frame._replace(pose=seed)
                return
            f = f._replace(pose=pose)
            self.state = OK
            self.n_tracked = n2
            self._last_good_pose = pose
            if prev_pose is not None:
                self._velocity_dev = lie.se3_compose(
                    pose, lie.se3_inverse(prev_pose)
                )
            prev_pose = pose
            self.last_frame = f
            self._track_pt_dev = track_pt
            if fi < len(self.trajectory):
                ts_e, _, _ = self.trajectory[fi]
                self.trajectory[fi] = (ts_e, pose, OK)
            if self._need_new_keyframe(n2):
                saved_idx = self.frame_idx
                self.frame_idx = fi
                self._create_new_keyframe(f, ts, track_pt)
                self.frame_idx = saved_idx

    def _flush_pending(self):
        pending, self._pending = self._pending, []
        for item in pending:
            self._finalize_pending(item)
        # Slow path needs the numpy mirrors.
        if self._velocity_dev is not None:
            self.velocity = np.asarray(self._velocity_dev)
            self._velocity_dev = None
        if self.last_track_pt is not None and not isinstance(
                self.last_track_pt, np.ndarray):
            self.last_track_pt = np.asarray(self.last_track_pt)

    def _refresh_local_points(self):
        """Recompute the device-side local point buffer from the covisibility
        neighborhood of the reference keyframe (runs on keyframe events only;
        the reference recomputes its local map per frame, but between
        keyframes the covisibility neighborhood is constant)."""
        if self.ref_kf < 0:
            return
        kfs = {self.ref_kf}
        for k in self.host.covisible_keyframes(self.ref_kf, 10, min_weight=1):
            kfs.add(int(k))
        more = set()
        for k in list(kfs):
            for j in self.host.covisible_keyframes(int(k), 5, min_weight=1):
                more.add(int(j))
        kfs |= more
        kfs |= set(self._recent_kf_slots(5))
        kfs = list(kfs)[: self.cfg.tracking.local_map_max_keyframes]
        from orb_slam_free_space_carving_tpu.runtime import mapstore

        ids = mapstore.local_point_ids(
            self.host.obs_pt, np.asarray(kfs, np.int32),
            self.host.pt_valid, LOCAL_POINTS_CAP,
        )
        if (ids.size < 300 and self.last_frame is not None
                and int(self.host.pt_valid.sum()) > ids.size):
            # Thin covisibility rows (see _nearby_point_ids): fill the buffer
            # with the nearest valid map points instead.
            nid, nmask = _nearby_point_ids(
                self.m.pt_xyz, self.m.pt_valid, self.last_frame.pose,
                LOCAL_POINTS_CAP,
            )
            self._local_ids = nid
            self._local_mask = nmask
            self._local_ids_np = np.asarray(nid)
            self._local_mask_np = np.asarray(nmask)
            return
        out = np.zeros(LOCAL_POINTS_CAP, np.int32)
        msk = np.zeros(LOCAL_POINTS_CAP, bool)
        out[: ids.size] = ids
        msk[: ids.size] = True
        self._local_ids_np, self._local_mask_np = out, msk
        self._local_ids = jnp.asarray(out)
        self._local_mask = jnp.asarray(msk)

    # ------------------------------------------------------------------
    # Monocular initialization (Tracking.cc:572-746)
    # ------------------------------------------------------------------
    def _build_init_frame(self, img) -> FrameData:
        """Monocular bootstrap frames extract ``init_multiplier``x the feature
        budget (reference builds a dedicated 2000-feature extractor for init,
        ``src/Tracking.cc:122-123``); the created keyframes truncate back to
        the runtime capacity in :meth:`_create_initial_map`."""
        mult = max(1, self.cfg.orb.init_multiplier)
        if mult == 1:
            return self.builder(img)
        if self._init_builder is None:
            import dataclasses

            orb2 = dataclasses.replace(
                self.cfg.orb,
                n_features=self.cfg.orb.n_features * mult,
                n_features_pad=self.cfg.orb.n_features_pad * mult,
            )
            self._init_builder = FrameBuilder(self.cfg.replace(orb=orb2))
        return self._init_builder(img)

    @staticmethod
    def _truncate_frame(frame: FrameData, n: int) -> FrameData:
        """Slice a 2x init frame down to the runtime feature capacity (the
        per-cell round-robin detection order means the first n features are
        the spatially-uniform best n)."""
        if frame.feat.capacity <= n:
            return frame
        feat = type(frame.feat)(*[a[:n] for a in frame.feat])
        return frame._replace(
            feat=feat, inv_sigma2=frame.inv_sigma2[:n],
            u_right=None if frame.u_right is None else frame.u_right[:n],
            depth=None if frame.depth is None else frame.depth[:n],
        )

    def _monocular_initialization(self, frame: FrameData, timestamp: float):
        n_valid = int(jnp.sum(frame.feat.valid))
        if self.init_frame is None or self.state == NO_IMAGES_YET:
            if n_valid >= self.cfg.tracking.min_init_matches:
                self.init_frame = frame
                self.init_timestamp = timestamp
                self.state = NOT_INITIALIZED
            self.last_frame = frame
            return

        if n_valid < self.cfg.tracking.min_init_matches:
            self.init_frame = None
            self.last_frame = frame
            return

        mcfg = self.cfg.matcher
        idx = _match_for_init(
            self.init_frame.feat, frame.feat,
            mcfg.search_radius_init, float(mcfg.th_low), mcfg.nn_ratio_tracking,
        )
        idx_np = np.asarray(idx)
        n_matches = int((idx_np >= 0).sum())
        if n_matches < self.cfg.tracking.min_init_matches:
            # Weak geometry: drop the init reference (Tracking.cc:598-617).
            self.init_frame = frame
            self.init_timestamp = timestamp
            self.last_frame = frame
            return

        sel = jnp.clip(idx, 0, frame.feat.capacity - 1)
        uv1 = self.init_frame.feat.uv_und
        uv2 = frame.feat.uv_und[sel]
        res = _init_two_view(uv1, uv2, idx >= 0, self.intr, self._next_key())
        if not bool(res.ok):
            self.last_frame = frame
            return

        self._create_initial_map(frame, timestamp, idx_np, res)

    def _create_initial_map(self, frame, timestamp, idx_np, res: twoview.TwoViewResult):
        """CreateInitialMapMonocular (Tracking.cc:646-746): two keyframes, the
        triangulated inliers as points, 20-iteration BA, median-depth gauge fix."""
        N0 = self.cfg.orb.n_features_pad
        if frame.feat.capacity > N0:
            # 2x init frames: keep the first N0 features of each (cell-rank
            # order = best-first) and drop matches that reach past the cut.
            idx_np = idx_np[:N0].copy()
            idx_np[idx_np >= N0] = -1
            res = res._replace(
                inliers=res.inliers[:N0], points=res.points[:N0]
            )
            frame = self._truncate_frame(frame, N0)
            self.init_frame = self._truncate_frame(self.init_frame, N0)

        inl = np.asarray(res.inliers) & (idx_np >= 0)
        n_pts = int(inl.sum())
        # The reference resets unless >=100 points survive the init BA
        # (Tracking.cc:736-744) — a thin bootstrap map dooms tracking within
        # a few frames and wastes a reset cycle.
        if n_pts < 100:
            self.last_frame = self._truncate_frame(frame, N0)
            return

        pts = np.asarray(res.points)[inl]                   # [n,3]
        feats1 = np.where(inl)[0]                           # feature idx in init frame
        feats2 = idx_np[inl]                                # feature idx in cur frame

        # Median-depth normalization (Tracking.cc:709-731).
        depths = pts[:, 2]
        med = float(np.median(depths))
        if med <= 0:
            self.last_frame = frame
            return
        pts = pts / med
        pose2 = np.asarray(res.pose21).copy()
        pose2[4:7] /= med

        # Allocate keyframes + points.
        kf1 = self.host.alloc_keyframe()
        kf2 = self.host.alloc_keyframe()
        pids = self.host.alloc_points(n_pts)

        N = frame.feat.capacity
        obs1 = np.full(N, -1, np.int32)
        obs2 = np.full(N, -1, np.int32)
        obs1[feats1] = pids
        obs2[feats2] = pids
        self.host.obs_pt[kf1] = obs1
        self.host.obs_pt[kf2] = obs2
        self.host.kf_frame_id[kf1] = self.frame_idx - 1
        self.host.kf_frame_id[kf2] = self.frame_idx
        self.host.kf_timestamp[kf1] = self.init_timestamp
        self.host.kf_timestamp[kf2] = timestamp

        f1, f2 = self.init_frame.feat, frame.feat
        m = self.m
        m = ms.insert_keyframe_arrays(
            m, kf1, lie.se3_identity(), f1.uv_und, f1.octave, f1.angle,
            f1.desc, f1.valid, jnp.asarray(obs1),
        )
        m = ms.insert_keyframe_arrays(
            m, kf2, jnp.asarray(pose2), f2.uv_und, f2.octave, f2.angle,
            f2.desc, f2.valid, jnp.asarray(obs2),
        )
        # Point attributes: descriptor from frame-2 feature, distances from kf2.
        desc = f2.desc[jnp.asarray(feats2)]
        ids = jnp.asarray(pids)
        xyz = jnp.asarray(pts, jnp.float32)
        centers2 = np.asarray(lie.se3_inverse(jnp.asarray(pose2)))[4:7]
        d = np.linalg.norm(pts - centers2, axis=-1)
        sf = self.cfg.orb.scale_factor
        oct2 = np.asarray(f2.octave)[feats2]
        max_dist = d * (sf ** oct2)
        min_dist = max_dist / (sf ** (self.cfg.orb.n_levels - 1))
        normal = (pts - centers2) / np.maximum(d[:, None], 1e-9)
        m = ms.add_points_arrays(
            m, ids, xyz, desc, jnp.asarray(normal, jnp.float32),
            jnp.asarray(min_dist, jnp.float32), jnp.asarray(max_dist, jnp.float32),
            jnp.full(n_pts, kf2, jnp.int32), jnp.full(n_pts, kf1, jnp.int32),
            jnp.ones(n_pts, bool),
        )

        # Global BA over the 2-view map (Tracking.cc:695, 20 iterations).
        O = 2 * n_pts
        cap_o = self.cfg.capacity.local_ba_obs
        obs_cam = np.zeros(cap_o, np.int32)
        obs_point = np.zeros(cap_o, np.int32)
        obs_uv = np.zeros((cap_o, 2), np.float32)
        obs_is2 = np.ones(cap_o, np.float32)
        obs_mask = np.zeros(cap_o, bool)
        uv1_np = np.asarray(f1.uv_und)
        uv2_np = np.asarray(f2.uv_und)
        is1 = np.asarray(self.init_frame.inv_sigma2)
        is2v = np.asarray(frame.inv_sigma2)
        obs_cam[:n_pts] = 0
        obs_point[:n_pts] = np.arange(n_pts)
        obs_uv[:n_pts] = uv1_np[feats1]
        obs_is2[:n_pts] = is1[feats1]
        obs_cam[n_pts:O] = 1
        obs_point[n_pts:O] = np.arange(n_pts)
        obs_uv[n_pts:O] = uv2_np[feats2]
        obs_is2[n_pts:O] = is2v[feats2]
        obs_mask[:O] = True

        pad_p = self.cfg.capacity.local_ba_points
        pts_pad = np.zeros((pad_p, 3), np.float32)
        pts_pad[:n_pts] = pts
        ptv = np.zeros(pad_p, bool)
        ptv[:n_pts] = True

        bares = _initial_ba(
            jnp.stack([lie.se3_identity(), jnp.asarray(pose2)]),
            jnp.asarray([False, True]),
            jnp.asarray(pts_pad), jnp.asarray(ptv),
            jnp.asarray(obs_cam), jnp.asarray(obs_point),
            jnp.asarray(obs_uv), jnp.asarray(obs_is2), jnp.asarray(obs_mask),
            self.intr, iterations=self.cfg.optimizer.gba_iterations_init,
            lm_lambda0=self.cfg.optimizer.lm_lambda_init,
            lm_lambda_factor=self.cfg.optimizer.lm_lambda_factor,
        )
        pose2_ba = bares.cam_poses[1]
        pts_ba = bares.points[:n_pts]
        m = m._replace(
            kf_pose=m.kf_pose.at[kf2].set(pose2_ba),
            pt_xyz=m.pt_xyz.at[ids].set(pts_ba),
        )
        self.m = ms.update_point_stats(
            m, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels,
            medoid_cap=self.cfg.capacity.max_obs_per_point,
        )

        self.host.update_covisibility(kf1)
        self.host.update_covisibility(kf2)
        self.host.parent[kf2] = kf1

        # CARV journal: first + second keyframe insertion events.
        c1 = np.zeros(3)
        c2 = np.asarray(lie.se3_inverse(pose2_ba))[4:7]
        self.host.journal.append(ms.JournalEvent(
            kind="keyframe", kf=kf1, cam_center=c1,
            new_points=np.asarray(pts_ba), new_point_ids=np.asarray(pids),
            vis_ids=np.asarray(pids),
        ))
        self.host.journal.append(ms.JournalEvent(
            kind="keyframe", kf=kf2, cam_center=np.asarray(c2),
            new_points=np.zeros((0, 3)), new_point_ids=np.zeros(0, np.int64),
            vis_ids=np.asarray(pids),
        ))

        # Tracking state.
        track_pt = np.full(N, -1, np.int32)
        track_pt[feats2] = pids
        self.last_track_pt = track_pt
        self._track_pt_dev = jnp.asarray(track_pt)
        self.last_frame = frame._replace(pose=pose2_ba)
        self.ref_kf = kf2
        self.last_kf_frame_idx = self.frame_idx
        self.velocity = None
        self.state = OK
        self.n_tracked = n_pts

        if self.local_mapper is not None:
            self.local_mapper.on_keyframe(kf1)
            self.local_mapper.on_keyframe(kf2)
        self._refresh_local_points()

    # ------------------------------------------------------------------
    # Frame-to-frame tracking
    # ------------------------------------------------------------------
    def _track_frame(self, frame: FrameData, timestamp: float):
        tcfg = self.cfg.tracking
        m = self.m
        tracked_ok = False
        was_reloc = False
        track_pt = np.full(frame.feat.capacity, -1, np.int32)

        if self.state == OK:
            if self.velocity is not None:
                tracked_ok, track_pt, pose = self._track_with_motion_model(frame)
                if not tracked_ok:
                    timing.count("slow.motion_fail")
            if not tracked_ok:
                tracked_ok, track_pt, pose = self._track_reference_keyframe(frame)
                if not tracked_ok:
                    timing.count("slow.refkf_fail")
        if self.state == LOST or not tracked_ok:
            reloc_ok = False
            # Backoff on long-lost stretches: after 20 consecutive failures
            # the camera is far from the map (a failed attempt costs a full
            # fused reloc program); try every other frame until one lands.
            skip = (self._reloc_fails > 20 and self.frame_idx % 2 == 1)
            if self.relocalizer is not None and not skip:
                reloc_ok, track_pt, pose = self.relocalizer.relocalize(frame)
            if not reloc_ok:
                self._reloc_fails += 1
                timing.count("slow.reloc_fail")
                self.state = LOST
                self.last_frame = frame._replace(
                    pose=self.last_frame.pose if self.last_frame else frame.pose
                )
                self.velocity = None
                return
            timing.count("slow.reloc_ok")
            self._reloc_fails = 0
            tracked_ok = True
            was_reloc = True

        frame = frame._replace(pose=pose)

        # Track local map.
        frame, track_pt, n_inliers = self._track_local_map(frame, track_pt)
        min_required = (
            tcfg.min_matches_track_localmap
        )
        if n_inliers < min_required:
            timing.count("slow.localmap_fail")
            self.state = LOST
            self.velocity = None
            self.last_frame = frame
            self.last_track_pt = track_pt
            return
        timing.count("slow.ok")

        self.state = OK
        self.n_tracked = n_inliers

        # Constant-velocity model update (Tracking.cc:451-459).  After a
        # relocalization the previous frame's pose belongs to the LOST era:
        # a velocity computed across the jump catapults the next prediction
        # (the reference clears mVelocity on reloc, Tracking.cc:1499-1504).
        if self.last_frame is not None and not was_reloc:
            self.velocity = np.asarray(
                lie.se3_compose(frame.pose, lie.se3_inverse(self.last_frame.pose))
            )
        elif was_reloc:
            self.velocity = None
            self._velocity_dev = None
            # Re-anchor the reference keyframe on the RELOCALIZED place: the
            # old ref_kf views the pre-loss region, so the next frame's
            # TrackReferenceKeyFrame would fail and ping-pong straight back
            # into relocalization (measured: 82 reloc_ok / 80 refkf_fail at
            # 3 fps).  The new reference = keyframe sharing the most points
            # with this frame's bindings.
            seen = track_pt[track_pt >= 0]
            if seen.size:
                from orb_slam_free_space_carving_tpu.runtime import mapstore

                hits = mapstore.kfs_observing(
                    self.host.obs_pt[: self.host.n_kf_slots],
                    self.host.kf_valid[: self.host.n_kf_slots].astype(np.uint8),
                    seen.astype(np.int32), self.cfg.capacity.max_points,
                    cap=1,
                )
                if hits.size:
                    self.ref_kf = int(hits[0])
                    self._ref_kf_frame = None

        # Keyframe decision + creation.
        if self._need_new_keyframe(n_inliers, frame=frame, track_pt=track_pt):
            self._create_new_keyframe(frame, timestamp, track_pt)

        self.last_frame = frame
        self.last_track_pt = track_pt
        self._track_pt_dev = jnp.asarray(track_pt)

    def _track_with_motion_model(self, frame: FrameData):
        """Tracking.cc:876-937."""
        m = self.m
        pose_pred = lie.se3_compose(
            jnp.asarray(self.velocity), self.last_frame.pose
        )
        last_pt = self.last_track_pt
        cand = last_pt >= 0
        pt_ids = np.where(cand, last_pt, 0)
        pt_ids_j = jnp.asarray(pt_ids)
        pt_xyz = m.pt_xyz[pt_ids_j]
        pt_desc = m.pt_desc[pt_ids_j]
        pt_valid = m.pt_valid[pt_ids_j] & jnp.asarray(cand)
        pt_octave = jnp.asarray(np.asarray(self.last_frame.feat.octave))
        pose, idx, inliers, n_inl = _track_motion_step(
            pose_pred, pt_xyz, pt_desc, pt_octave, pt_valid,
            frame.feat, frame.inv_sigma2, self.intr,
            self.cfg.matcher.search_radius_motion, self.cfg.orb.scale_factor,
            self.wh, opt_cfg=self.cfg.optimizer,
        )
        n = int(n_inl)
        idx_np = np.asarray(idx)
        inl_np = np.asarray(inliers)
        track_pt = np.full(frame.feat.capacity, -1, np.int32)
        ok_rows = (idx_np >= 0) & inl_np
        track_pt[idx_np[ok_rows]] = last_pt[ok_rows]
        return n >= self.cfg.tracking.min_matches_track, track_pt, pose

    def _track_reference_keyframe(self, frame: FrameData, seed_pose=None):
        """Tracking.cc:766-808: match against ref KF, optimize from last pose.

        ``seed_pose`` overrides the GN seed (default: last frame's pose) —
        used by the pipelined-decision recovery path, where the last frame's
        optimistic pose is known-bad."""
        m = self.m
        kf = self.ref_kf
        if kf < 0:
            return False, np.full(frame.feat.capacity, -1, np.int32), frame.pose
        if seed_pose is None:
            seed_pose = self.last_frame.pose
        kf_obs = self.host.obs_pt[kf]
        cand = kf_obs >= 0
        pt_ids = np.where(cand, kf_obs, 0)
        pt_ids_j = jnp.asarray(pt_ids)
        pt_xyz = m.pt_xyz[pt_ids_j]
        pt_desc = m.pt_desc[pt_ids_j]
        pt_valid = m.pt_valid[pt_ids_j] & jnp.asarray(cand)
        # Use the tracker-held reference-KF frame when available: in async
        # mode the device-side KF arrays may not have landed yet (the insert
        # runs on the stage worker), and the frame copy is always current.
        if self._ref_kf_frame is not None and self.last_kf_frame_idx >= 0:
            pt_octave = self._ref_kf_frame.feat.octave
        else:
            pt_octave = m.kf_octave[kf]
        # Wide search from the seed pose (BoW-free stand-in for SearchByBoW).
        pose, idx, inliers, n_inl = _track_motion_step(
            seed_pose, pt_xyz, pt_desc, pt_octave, pt_valid,
            frame.feat, frame.inv_sigma2, self.intr,
            self.cfg.matcher.search_radius_init, self.cfg.orb.scale_factor,
            self.wh, opt_cfg=self.cfg.optimizer,
        )
        n = int(n_inl)
        idx_np = np.asarray(idx)
        inl_np = np.asarray(inliers)
        track_pt = np.full(frame.feat.capacity, -1, np.int32)
        ok_rows = (idx_np >= 0) & inl_np
        track_pt[idx_np[ok_rows]] = pt_ids[ok_rows]
        return n >= self.cfg.tracking.min_matches_track, track_pt, pose

    def _recent_kf_slots(self, n: int) -> list:
        """Slots of the n most recently CREATED keyframes (by frame id).

        The reference's UpdateLocalKeyFrames always chains in the temporal
        neighbors of the current keyframe (Tracking.cc:1300-1317); without
        them a reference keyframe whose observation row is still thin (young
        keyframe, degraded bindings, or a lagging worker) yields a
        near-empty local buffer — measured as 16-point buffers killing
        recovery on an 87-keyframe map."""
        valid = np.where(self.host.kf_valid)[0]
        if valid.size == 0:
            return []
        order = valid[np.argsort(-self.host.kf_frame_id[valid])]
        return [int(k) for k in order[:n]]

    def _local_point_ids(self, track_pt: np.ndarray) -> np.ndarray:
        """Local map point set: points of covisible KFs of the ref KF
        (UpdateLocalKeyFrames/Points, Tracking.cc:1204-1348), capacity-padded."""
        from orb_slam_free_space_carving_tpu.runtime import mapstore

        kfs = set()
        seen_pts = track_pt[track_pt >= 0]
        # Keyframes observing currently tracked points (native early-exit
        # row scan; the old np.isin was O(K*N) python per slow frame).
        if seen_pts.size:
            kf_hits = mapstore.kfs_observing(
                self.host.obs_pt[: self.host.n_kf_slots],
                self.host.kf_valid[: self.host.n_kf_slots].astype(np.uint8),
                seen_pts.astype(np.int32), self.cfg.capacity.max_points,
                cap=self.cfg.tracking.local_map_max_keyframes,
            )
            for k in kf_hits:
                kfs.add(int(k))
        if self.ref_kf >= 0:
            kfs.add(self.ref_kf)
            for k in self.host.covisible_keyframes(self.ref_kf, 10, min_weight=1):
                kfs.add(int(k))
        more = set()
        for k in list(kfs)[: self.cfg.tracking.local_map_max_keyframes]:
            for j in self.host.covisible_keyframes(k, 5, min_weight=1):
                more.add(int(j))
        kfs |= more
        kfs |= set(self._recent_kf_slots(5))
        kfs = list(kfs)[: self.cfg.tracking.local_map_max_keyframes]
        ids = np.unique(self.host.obs_pt[kfs])
        ids = ids[ids >= 0]
        ids = ids[self.host.pt_valid[ids]]
        if ids.size > LOCAL_POINTS_CAP:
            ids = ids[:LOCAL_POINTS_CAP]
        out = np.zeros(LOCAL_POINTS_CAP, np.int32)
        msk = np.zeros(LOCAL_POINTS_CAP, bool)
        out[: ids.size] = ids
        msk[: ids.size] = True
        return out, msk

    def _track_local_map(self, frame: FrameData, track_pt: np.ndarray):
        m = self.m
        ids, idmask = self._local_point_ids(track_pt)
        ids_j = jnp.asarray(ids)
        # Refresh the fast path's device-side local buffer for free: the
        # slow path just computed the per-frame local set the reference
        # recomputes every frame (Tracking.cc:1204-1348).  Without this a
        # recovery frame fed the NEXT fast frame the same stale buffer that
        # caused the failure, locking the tracker into a fast/slow
        # oscillation.
        self._local_ids_np, self._local_mask_np = ids, idmask
        self._local_ids = ids_j
        self._local_mask = jnp.asarray(idmask)
        self._last_refresh_frame = self.frame_idx
        pt_xyz = m.pt_xyz[ids_j]
        pt_desc = m.pt_desc[ids_j]
        pt_valid = m.pt_valid[ids_j] & jnp.asarray(idmask)
        pt_maxd = m.pt_max_dist[ids_j]
        pt_norm = m.pt_normal[ids_j]
        # Exclude already-tracked points from the new search.
        already = np.isin(ids, track_pt[track_pt >= 0])
        pt_valid = pt_valid & jnp.asarray(~already)

        new_idx, vis = _track_localmap_step(
            frame.pose, pt_xyz, pt_desc, pt_valid, pt_maxd, pt_norm,
            jnp.asarray(already), frame.feat, frame.inv_sigma2,
            jnp.asarray(track_pt), self.intr,
            self.cfg.orb.scale_factor, self.cfg.orb.n_levels, self.wh,
        )
        new_idx_np = np.asarray(new_idx)
        rows = new_idx_np >= 0
        track_pt = track_pt.copy()
        track_pt[new_idx_np[rows]] = ids[rows]

        pose, inliers, n_inl = _pose_opt_from_bindings(
            frame.pose, jnp.asarray(track_pt), m.pt_xyz, frame.feat,
            frame.inv_sigma2, self.intr,
            frame_ur=frame.u_right, bf=self.cfg.camera.bf,
            opt_cfg=self.cfg.optimizer,
        )
        inl_np = np.asarray(inliers)
        track_pt = np.where(inl_np | (track_pt < 0), track_pt, -1)
        # Visible/found counters (MapPoint::IncreaseVisible/Found).
        vis_np = np.asarray(vis) | already
        found_ids = track_pt[track_pt >= 0]
        found_pad = np.zeros(LOCAL_POINTS_CAP, np.int32)
        found_mask = np.zeros(LOCAL_POINTS_CAP, bool)
        fz = min(found_ids.size, LOCAL_POINTS_CAP)
        found_pad[:fz] = found_ids[:fz]
        found_mask[:fz] = True
        self.host.ctr_visible, self.host.ctr_found = _counter_update(
            self.host.ctr_visible, self.host.ctr_found,
            ids_j, jnp.asarray(vis_np & idmask),
            jnp.asarray(found_pad), jnp.asarray(found_mask),
        )
        return frame._replace(pose=pose), track_pt, int(n_inl)

    # ------------------------------------------------------------------
    def _need_new_keyframe(self, n_inliers: int, frame: FrameData = None,
                           track_pt: np.ndarray = None,
                           close_counts=None) -> bool:
        """Keyframe policy c1a|c1b|c1c & c2 (Tracking.cc:986-1070).

        For stereo/RGB-D frames the close-point pressure condition applies:
        bNeedToInsertClose = tracked-close < 100 and untracked-close > 70
        (``Tracking.cc:1010-1026``), and the reference-match ratio drops to
        0.75 (``:1028-1033``)."""
        tcfg = self.cfg.tracking
        if self.only_tracking:
            # Localization-only mode never inserts keyframes
            # (Tracking.cc:986-991 mbOnlyTracking early-return).
            return False
        if self.ref_kf < 0:
            return False
        mapper_idle = (self.local_mapper is None
                       or self.local_mapper.accepts_keyframes())
        # Reference tracked count: MATURE points in the ref KF —
        # TrackedMapPoints(nMinObs) with nMinObs=3 (2 while the map has <=2
        # keyframes), Tracking.cc:994-997.  Counting the raw obs row instead
        # inflates n_ref with young single-pair points and floods keyframes
        # (each instantly redundant -> cull churn -> thin respawned rows).
        from orb_slam_free_space_carving_tpu.runtime import mapstore

        ref_obs = self.host.obs_pt[self.ref_kf]
        pids = ref_obs[ref_obs >= 0]
        # Maturity threshold: the reference's nMinObs=3 (Tracking.cc:994-997).
        # (Counting 2-obs points inflates n_ref toward the raw row size and
        # makes c2 fire almost every frame — a keyframe flood whose
        # coalesced triangulations starve the very map they should feed.
        # The asynchronous-lag bleed-out that motivated relaxing it is
        # covered by the rate-limited ``low_cov`` absolute trigger below.)
        n_kf_total_ = int(self.host.kf_valid.sum())
        min_obs = 3 if n_kf_total_ > 2 else 2
        counts = mapstore.obs_counts(
            self.host.obs_pt[: self.host.n_kf_slots],
            self.host.kf_valid[: self.host.n_kf_slots].astype(np.uint8),
            self.cfg.capacity.max_points,
        )
        n_ref = int((counts[pids] >= min_obs).sum()) if pids.size else 0
        frames_since = self.frame_idx - self.last_kf_frame_idx

        need_close = False
        ratio = tcfg.kf_min_ratio_refkf
        depth_frame = False
        if close_counts is not None:
            # Fast path: close-point pressure counted in-program
            # (_fused_track_step_frame), read back as scalars.
            tracked_close, untracked_close = close_counts
            need_close = tracked_close < 100 and untracked_close > 70
            ratio = 0.75
            depth_frame = True
        elif frame is not None and frame.depth is not None \
                and track_pt is not None:
            d = np.asarray(frame.depth)
            close = (d > 0) & (d < self.cfg.camera.th_depth_m)
            tracked_close = int((close & (track_pt >= 0)).sum())
            untracked_close = int((close & (track_pt < 0)).sum())
            need_close = tracked_close < 100 and untracked_close > 70
            ratio = 0.75
            depth_frame = True

        c1a = frames_since >= tcfg.max_frames_between_kf
        c1b = frames_since >= tcfg.min_frames_between_kf and mapper_idle
        c1c = n_inliers < n_ref * 0.25 or need_close
        if not depth_frame:
            c1c = n_inliers < n_ref * 0.25
        # Absolute low-coverage pressure: when inliers approach the loss
        # threshold, a keyframe (-> triangulation for the new viewpoint) is
        # needed NO MATTER what ratio n/n_ref reads — the ratio gate is blind
        # when the reference keyframe itself was thin (n ~ n_ref ~ 50 decays
        # to LOST without ever tripping n < 0.9*n_ref).  Rate-limited to one
        # every 3 frames: an unthrottled trigger floods keyframes exactly in
        # the hard segments (every-frame KFs that all coalesce away their
        # triangulation — starving the map it was meant to feed).
        low_cov = (n_inliers < 2 * tcfg.min_matches_track_localmap
                   and frames_since >= 3)
        c2 = (n_inliers < n_ref * ratio or need_close or low_cov) \
            and n_inliers > 15
        decision = bool((c1a or c1b or c1c or low_cov) and c2)
        import os as _os

        if _os.environ.get("OSFSC_DEBUG") and self.frame_idx % 10 == 0:
            import sys as _sys

            print(f"[osfsc] f{self.frame_idx}: n={n_inliers} n_ref={n_ref} "
                  f"since={frames_since} idle={mapper_idle} "
                  f"kf={'Y' if decision else 'n'}",
                  file=_sys.stderr, flush=True)
        return decision

    def _create_new_keyframe(self, frame: FrameData, timestamp: float,
                             track_pt: np.ndarray):
        """Tracking.cc:1072-1150 + CARV AddKeyFrameEntry hook.

        Tracking-thread part: slot allocation + host bookkeeping (cheap, no
        device sync).  The map writes (device insert, covisibility, journal,
        mapping/loop/carving chain) run on the stage worker in async mode —
        the reference's Tracking -> LocalMapping queue hand-off
        (``LocalMapping.cc:124-129``)."""
        kf = self.host.alloc_keyframe()
        import os as _os

        if _os.environ.get("OSFSC_DEBUG"):
            import sys as _sys

            print(f"[osfsc] KF {kf} created at frame {self.frame_idx}",
                  file=_sys.stderr, flush=True)
        new_xyz = np.zeros((0, 3))
        new_pids = np.zeros(0, np.int64)
        self.host.kf_frame_id[kf] = self.frame_idx
        self.host.kf_timestamp[kf] = timestamp
        self.ref_kf = kf
        self._ref_kf_frame = frame
        self.last_kf_frame_idx = self.frame_idx

        use_async = (
            self.runner is not None and not self.runner.deterministic
        )
        if use_async:
            # The obs_pt row MUST land before the worker runs: ref-KF
            # tracking, _need_new_keyframe (n_ref) and _local_point_ids all
            # read it from the tracking thread, and a reused culled slot
            # still holds another keyframe's bindings.  track_pt's dispatch
            # already completed (its inlier count was read), so this pull is
            # a small ready-buffer D2H copy, not a queue drain.
            # Depth frames: close-point insertion (Tracking.cc:1098-1146)
            # happens worker-side (None sentinel) — the new bindings reach
            # the tracker via the local-buffer refresh a frame or two later,
            # keeping the map write on the single-writer thread.
            track_pt_np = np.asarray(track_pt)
            self.host.obs_pt[kf] = track_pt_np
            self.last_track_pt = track_pt_np
            self.runner.submit(
                self._process_keyframe_mapside, kf, frame, track_pt_np,
                None if frame.depth is not None else new_xyz,
                None if frame.depth is not None else new_pids,
            )
            return

        track_pt = np.asarray(track_pt)
        if frame.depth is not None:
            # Close-point insertion (Tracking.cc:1098-1146): unbound features
            # with depth become map points, nearest first, until depth exceeds
            # ThDepth and at least 100 points exist.  Inline-only path
            # (stereo/RGB-D runs the deterministic pipeline).
            track_pt, new_xyz, new_pids = self._insert_depth_points(
                frame, kf, track_pt
            )
        self.host.obs_pt[kf] = track_pt
        self.last_track_pt = track_pt
        self._process_keyframe_mapside(kf, frame, track_pt, new_xyz,
                                       new_pids)

    def _process_keyframe_mapside(self, kf: int, frame: FrameData,
                                  track_pt: np.ndarray, new_xyz, new_pids):
        """Map-writing half of keyframe insertion; runs on the stage worker
        (async) or inline (deterministic)."""
        with timing.span("worker.map_keyframe"):
            self._process_keyframe_mapside_inner(kf, frame, track_pt,
                                                 new_xyz, new_pids)

    def _process_keyframe_mapside_inner(self, kf: int, frame: FrameData,
                                        track_pt, new_xyz, new_pids):
        if new_xyz is None:                      # async depth keyframe
            new_xyz = np.zeros((0, 3))
            new_pids = np.zeros(0, np.int64)
            if frame.depth is not None:
                track_pt, new_xyz, new_pids = self._insert_depth_points(
                    frame, kf, np.asarray(track_pt)
                )
        track_pt_dev = jnp.asarray(track_pt)
        track_pt = np.asarray(track_pt)          # device pull on the worker
        self.host.obs_pt[kf] = track_pt
        f = frame.feat
        self.m = ms.insert_keyframe_arrays(
            self.m, kf, frame.pose, f.uv_und, f.octave, f.angle, f.desc,
            f.valid, track_pt_dev, ur_row=frame.u_right,
        )
        self.host.update_covisibility(kf)

        # CARV event: new cam + visibility list (Modeler::AddKeyFrameEntry).
        center = np.asarray(lie.se3_inverse(frame.pose))[4:7]
        vis_ids = track_pt[track_pt >= 0]
        self.host.journal.append(ms.JournalEvent(
            kind="keyframe", kf=kf, cam_center=center,
            new_points=new_xyz, new_point_ids=new_pids,
            vis_ids=vis_ids.copy(),
        ))
        if self.local_mapper is not None:
            big0 = self.host.big_change_idx
            self.local_mapper.on_keyframe(kf)
            if self.host.big_change_idx != big0:
                self._on_map_jump(kf)
        # Under keyframe backlog the buffer refresh coalesces too — the next
        # queued keyframe item refreshes with a fresher covisibility anyway.
        if not (self.local_mapper is not None
                and getattr(self.local_mapper, "_later_kf_waiting", None)
                and self.local_mapper._later_kf_waiting()):
            self._refresh_local_points()

    def _on_map_jump(self, kf: int):
        """A loop closure / global BA moved the whole map while keyframe
        ``kf`` was processed (LoopClosing::CorrectLoop).  Re-sync the tracker
        onto the corrected keyframe pose; the next frame re-tracks against
        the reference KF from there (the motion-model velocity is stale
        across the jump).  In async mode only the flag is set here (worker
        thread); the tracking thread applies it at its next frame."""
        if self.runner is not None and not self.runner.deterministic:
            self._map_jump_kf = kf
            return
        self.last_frame = self.last_frame._replace(pose=self.m.kf_pose[kf])
        self.velocity = None
        self._velocity_dev = None
        self._force_slow = True
        # Any in-flight fast-path frame was computed against the
        # pre-correction map; its pose must not seed a keyframe.
        self._stale_pending = len(self._pending)

    def _insert_depth_points(self, frame: FrameData, kf: int,
                             track_pt: np.ndarray):
        """Create map points from stereo/RGB-D depth for unbound features
        (Tracking.cc:1098-1146).  Returns (track_pt', new_xyz, new_pids)."""
        d = np.asarray(frame.depth)
        valid = np.asarray(frame.feat.valid)
        unbound = (track_pt < 0) & valid & (d > 0)
        cand = np.where(unbound)[0]
        if cand.size == 0:
            return track_pt, np.zeros((0, 3)), np.zeros(0, np.int64)
        order = cand[np.argsort(d[cand])]
        th = self.cfg.camera.th_depth_m
        n_close = int((d[order] <= th).sum())
        take = order[: max(n_close, min(100, order.size))]
        if take.size == 0:
            return track_pt, np.zeros((0, 3)), np.zeros(0, np.int64)
        try:
            pids = self.host.alloc_points(take.size)
        except RuntimeError:
            return track_pt, np.zeros((0, 3)), np.zeros(0, np.int64)

        uv_np = np.asarray(frame.feat.uv_und)[take]
        dz = d[take]
        cam = self.cfg.camera
        xyz_c = np.stack([
            (uv_np[:, 0] - cam.cx) / cam.fx * dz,
            (uv_np[:, 1] - cam.cy) / cam.fy * dz,
            dz,
        ], axis=-1).astype(np.float32)
        T_wc = lie.se3_inverse(frame.pose)
        xyz_w = np.asarray(lie.se3_apply(T_wc, jnp.asarray(xyz_c)))
        center = np.asarray(T_wc)[4:7]

        sf = self.cfg.orb.scale_factor
        oct_np = np.asarray(frame.feat.octave)[take]
        dist = np.linalg.norm(xyz_w - center, axis=-1)
        max_dist = dist * (sf ** oct_np)
        min_dist = max_dist / (sf ** (self.cfg.orb.n_levels - 1))
        normal = (xyz_w - center) / np.maximum(dist[:, None], 1e-9)
        self.m = ms.add_points_arrays(
            self.m, jnp.asarray(pids), jnp.asarray(xyz_w, jnp.float32),
            frame.feat.desc[jnp.asarray(take)], jnp.asarray(normal, jnp.float32),
            jnp.asarray(min_dist, jnp.float32), jnp.asarray(max_dist, jnp.float32),
            jnp.full(take.size, kf, jnp.int32), jnp.full(take.size, kf, jnp.int32),
            jnp.ones(take.size, bool),
        )
        track_pt = track_pt.copy()
        track_pt[take] = pids
        if self.local_mapper is not None:
            for pid in pids:
                self.local_mapper.recent_points.append(
                    (int(pid), self.local_mapper.fuse_counter)
                )
        return track_pt, xyz_w.astype(np.float64), pids.astype(np.int64)
