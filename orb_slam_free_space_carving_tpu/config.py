"""Typed configuration system.

Unifies the reference's two config sources into one typed tree
(cf. SURVEY.md section 5 "Config / flag system"):

- the per-dataset YAML files parsed with ``cv::FileStorage``
  (reference ``src/Tracking.cc:46-145``, ``Examples/Monocular/TUM1.yaml``), and
- the algorithm constants hard-coded in reference source (chi2 thresholds
  ``src/Optimizer.cc:85-86``, matcher thresholds ``src/ORBmatcher.cc:37-39``,
  covisibility weight ``src/KeyFrame.cc:330``, CARV constants
  ``src/Modeler/FreespaceDelaunayAlgorithm.h:57`` etc.).

The numeric *behavior lore* (all the magic constants) is preserved here even
where the TPU mechanism differs, because they materially affect trajectory
accuracy (SURVEY.md section 7 hard-part 6).
"""

from __future__ import annotations

import dataclasses
import math
import re
from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class CameraConfig:
    """Pinhole + radial-tangential distortion camera.

    Mirrors the ``Camera.*`` YAML block (reference ``src/Tracking.cc:50-116``).
    """

    fx: float = 517.306408
    fy: float = 516.469215
    cx: float = 318.643040
    cy: float = 255.313989
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    width: int = 640
    height: int = 480
    fps: float = 30.0
    bf: float = 0.0          # stereo baseline * fx (reference "Camera.bf")
    rgb: bool = True         # input channel order flag (reference "Camera.RGB")
    th_depth: float = 40.0   # close/far stereo point threshold (reference "ThDepth")
    depth_map_factor: float = 5000.0  # RGB-D depth scaling ("DepthMapFactor")

    @property
    def K(self):
        import numpy as np

        return np.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=np.float32,
        )

    @property
    def dist_coeffs(self):
        import numpy as np

        return np.array([self.k1, self.k2, self.p1, self.p2, self.k3], dtype=np.float32)

    @property
    def has_distortion(self) -> bool:
        return any(abs(c) > 0 for c in (self.k1, self.k2, self.p1, self.p2, self.k3))

    @property
    def baseline(self) -> float:
        """Stereo baseline in meters (bf / fx)."""
        return self.bf / self.fx if self.bf else 0.0

    @property
    def th_depth_m(self) -> float:
        """Close/far point threshold in meters: mThDepth = bf*ThDepth/fx
        (reference ``src/Tracking.cc:99-105``)."""
        return self.bf * self.th_depth / self.fx if self.bf else 0.0


@dataclass(frozen=True)
class ORBConfig:
    """Feature front-end budget (reference ``ORBextractor.*`` YAML block).

    ``n_features_pad`` is the TPU fixed capacity the frontend pads keypoint
    arrays to (static shapes under jit); the extractor still targets
    ``n_features`` live detections like the reference quadtree budget
    (reference ``src/ORBextractor.cc:435-446``).
    """

    n_features: int = 1000
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    init_multiplier: int = 2   # 2x features during monocular init (Tracking.cc:122-123)
    n_features_pad: int = 1024
    cell_size: int = 32        # detection cell; reference uses 30px cells (:769)
    edge_threshold: int = 19   # border for descriptor support (ORBextractor.cc:1043)

    @property
    def scale_factors(self):
        return [self.scale_factor ** i for i in range(self.n_levels)]

    @property
    def level_sigma2(self):
        return [s * s for s in self.scale_factors]


@dataclass(frozen=True)
class MatcherConfig:
    """Hamming matcher thresholds (reference ``src/ORBmatcher.cc:37-39``)."""

    th_low: int = 50
    th_high: int = 100
    histo_length: int = 30    # rotation-consistency histogram bins
    nn_ratio_tracking: float = 0.9
    nn_ratio_bow: float = 0.75
    search_radius_motion: float = 15.0
    search_radius_init: float = 100.0


@dataclass(frozen=True)
class TrackingConfig:
    """Tracking state machine + keyframe policy (reference ``src/Tracking.cc``)."""

    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 30        # defaults to fps (Tracking.cc:126)
    min_matches_track: int = 10            # motion-model / refkf accept (:931, :806)
    min_matches_track_localmap: int = 30   # TrackLocalMap accept (:977)
    min_matches_after_reloc: int = 50      # stricter right after reloc (:973)
    min_init_matches: int = 100            # monocular init gate (:615)
    local_map_max_keyframes: int = 80      # covisibility expansion cap (:1293)
    kf_min_ratio_refkf: float = 0.9        # c2: matches < 0.9*ref (:1052-1060)
    reloc_max_candidates: int = 8
    # Per-frame scalar decisions (tracking health + keyframe policy) are read
    # back from the device in batches of this many frames: the TPU tunnel puts
    # a ~25ms latency floor on EVERY device->host sync (scripts/probe_floor*),
    # so the hot loop amortizes one sync over the batch.  Decisions lag by at
    # most decision_batch-1 frames (the reference reads them inline on CPU;
    # bounded staleness is the TPU-idiomatic equivalent).
    # Depth 4: deep enough to hide the ~25 ms readback behind ~2.5 frames of
    # device work, shallow enough that the dispatch queue ahead of the
    # mapping worker's programs stays short (the device is shared; a deep
    # tracker queue delays every worker sync and lets the map lag the
    # camera until tracking dies).
    decision_batch: int = 4
    # Losing the camera with <=5 keyframes triggers a full system reset +
    # re-initialization (Tracking.cc:480-489) — a bad bootstrap must not
    # leave the tracker relocalizing forever against a garbage 2-KF map.
    reset_on_early_lost: bool = True
    # Async-lag bridge: with the mapping worker on the same device, newly
    # triangulated points land ~5-15 frames after their keyframe; inliers
    # decay across that gap.  Frames with n in [min_matches_track,
    # min_matches_track_localmap) keep tracking in a DEGRADED state (pose
    # GN over 10-29 matches is still reliable on this camera) for at most
    # this many consecutive frames before declaring LOST.  The reference
    # has no such gap (its LocalMapping runs on a spare CPU core) and dies
    # at <30 immediately; a bounded bridge is the TPU-pipeline equivalent,
    # not a relaxation of the final accept (trajectory quality is still
    # gated by the ATE tests).
    # 20 frames: long enough to span the worker's triangulation lag, short
    # enough that a 10-29-inlier pose cannot wander beyond the recovery
    # search window (24 px) before a hard re-track is forced.
    max_degraded_frames: int = 20


@dataclass(frozen=True)
class MappingConfig:
    """Local mapping stage (reference ``src/LocalMapping.cc``)."""

    triangulation_neighbors: int = 20   # best covisible KFs for new points (:250)
    fuse_neighbors: int = 20            # SearchInNeighbors 1-hop targets (:471)
    cull_found_ratio: float = 0.25      # MapPointCulling (:195)
    cull_min_obs_after: int = 3         # point must reach 3 obs by 2 KFs (:199-205)
    kf_cull_redundancy: float = 0.9     # KeyFrameCulling 90% rule (:645-709)
    covisibility_weight_min: int = 15   # covisibility edge threshold (KeyFrame.cc:330)


@dataclass(frozen=True)
class LoopConfig:
    """Loop closing + relocalization (reference ``src/LoopClosing.cc``)."""

    covisibility_consistency_th: int = 3   # consecutive-group consistency (:152)
    min_bow_matches: int = 20              # per-candidate SearchByBoW gate (:281)
    min_sim3_inliers: int = 20             # OptimizeSim3 accept (:330)
    min_total_matches: int = 40            # final guided-projection accept (:394)
    # The reference iterates Sim3 RANSAC in 5-hypothesis rounds up to 300
    # total (Sim3Solver::iterate :140-224); the batched TPU RANSAC evaluates
    # every hypothesis in one dispatch, so only the total budget survives.
    sim3_ransac_max_iterations: int = 300  # hypothesis batch (ops/horn.py)
    # Hierarchical BoW vocabulary (the DBoW2 tree, ops/bow.py): 16-ary,
    # ceil(log16 W) levels; 65536 words by default (reference ships ~1M,
    # ORBVocabulary.h:30-31 — the importer below loads those too).  Word
    # assignment is vectorized tree descent; the loop/reloc database stores
    # sparse (word, weight) rows.
    vocab_words: int = 65536
    vocab_seed: int = 7
    # Tree depth of the matcher gating layer (FeatureVector levelsup analog):
    # depth 1 = 16 nodes for the 16-ary tree.  Depth 2 (256 nodes) measured
    # 0.47 true-pair agreement on degraded synthetic revisits and starved
    # triangulation at keyframe baselines; depth 1 measures 0.75 and the
    # epipolar + rotation + TH_LOW gates carry the rest of the selectivity.
    vocab_coarse_level: int = 1
    # Optional DBoW2 text vocabulary to import (the format written by the
    # reference's tools/bin_vocabulary.cc / saveToTextFile); overrides the
    # trained/seeded tree when set.
    vocab_path: Optional[str] = None
    min_score_ratio: float = 0.75          # accScore >= 0.75*best (KeyFrameDatabase.cc:183)
    min_common_words_ratio: float = 0.8    # commonWords > 0.8*max (KeyFrameDatabase.cc:125)


@dataclass(frozen=True)
class OptimizerConfig:
    """Solver iteration budgets + robust thresholds (reference ``src/Optimizer.cc``).

    chi2 values are the 95% quantiles for 2/3 DoF used as Huber deltas squared
    (``Optimizer.cc:85-86,369-371``).
    """

    chi2_mono: float = 5.991
    chi2_stereo: float = 7.815
    pose_rounds: int = 4
    pose_iterations: int = 10
    # GN budget inside the FUSED per-frame dispatch (3 pose solves/frame):
    # GN from a one-frame-old seed converges in <4 steps; the reference's
    # 10 LM its/round budget costs 3.6 ms/solve on the TPU vs 2.3 at 4
    # (scripts/probe: r4i10 3.63 ms, r4i4 2.30 ms) and the 4-round chi2
    # relabelling lore is preserved.  Slow-path/BA budgets are unchanged.
    pose_iterations_fused: int = 4
    local_ba_iterations_a: int = 5
    local_ba_iterations_b: int = 10
    essential_graph_iterations: int = 20
    gba_iterations_loop: int = 10
    gba_iterations_init: int = 20
    sim3_opt_iterations: int = 5   # OptimizeSim3 runs 5 then 10 more (:1203-1228)
    lm_lambda_init: float = 1e-4   # initial LM damping (ops/ba.py solvers)
    lm_lambda_factor: float = 2.0  # accept: lam/=f; reject: lam*=f^2
    essential_graph_min_feat: int = 100  # strong covisibility edges (Optimizer.cc:819)


@dataclass(frozen=True)
class CarvingConfig:
    """Free-space carving stage.

    Semantics preserved from the reference CARV core
    (``src/Modeler/FreespaceDelaunayAlgorithm.{h,cc}``): visibility rays carve
    free space; the surface separates carved (outside) from uncarved (inside)
    cells; a min-cut with weak area smoothing (lambda=0.05, ``.cc:1579``)
    regularizes it; the bounding volume is 10x the data extent (``.cc:775-830``);
    mesh extraction is throttled (``SFMTranscriptInterface_Delaunay.cpp:404``).

    The TPU discretization is a dense voxel vote grid carved by batched
    ray-marching (primary) with an optional host Delaunay topology oracle.
    """

    grid_resolution: int = 128
    bounds_scale: float = 1.3          # voxel grid extent vs data extent
    evidence_dilation: int = 1         # surface gate reach (voxels)
    ray_samples: int = 96              # samples per carving ray
    lambda_smooth: float = 0.05
    free_vote_threshold: float = 0.5   # vote>0 in reference; soft for voxels
    mesh_interval_s: float = 5.0       # isosurface recompute throttle
    mesh_every_kfs: int = 5            # KF-cadence mesh throttle
    mrf_iterations: int = 32           # parallel min-cut relaxation sweeps
    # (The reference's K=1 constraint-forgetting heuristic,
    # FreespaceDelaunayAlgorithm.h:57, has no analog here: the voxel recast
    # accumulates votes instead of per-tet constraint lists.)
    max_rays_per_kf: int = 1024
    use_delaunay_oracle: bool = False  # host scipy Delaunay + batched tet voting
    # Incremental re-carving (the reference's per-keyframe incremental tet
    # updates, FreespaceDelaunayAlgorithm.cc:274-302): keep persistent vote
    # grids and, per mesh update, deposit only rays of NEW/MOVED keyframes and
    # retract (weight=-1) the previously deposited rays of changed/culled
    # ones.  Cost O(changed constraints), not O(map).  A full recompute
    # triggers automatically when the data outgrows the frozen grid bounds or
    # most keyframes moved (e.g. after a loop closure / global BA).
    incremental: bool = True
    incremental_tol_voxels: float = 0.25   # re-carve a KF if moved > tol
    incremental_oob_frac: float = 0.02     # full recompute if OOB targets >2%
    # Camera origins outside the frozen box lose only their near-camera
    # free-space samples (per-sample drop in carve_votes), so the origin
    # trigger is looser than the target one — but NOT absent: a silently
    # shrinking coverage box would under-carve near new cameras forever.
    incremental_origin_oob_frac: float = 0.25
    incremental_churn_frac: float = 0.6    # full recompute if >60% KFs changed


@dataclass(frozen=True)
class CapacityConfig:
    """Fixed TPU array capacities (static shapes under jit).

    The reference's dynamically sized map (``std::set`` registries,
    ``src/Map.cc``) becomes fixed-capacity device arrays + validity masks with
    a host-side slot allocator.
    """

    max_keyframes: int = 512
    max_points: int = 65536
    max_obs_per_point: int = 32
    local_ba_window: int = 16          # optimized KFs per local BA
    local_ba_fixed: int = 8            # fixed anchor KFs
    local_ba_points: int = 8192
    local_ba_obs: int = 16384
    loop_candidates: int = 8
    gba_obs: int = 65536               # full-map BA observation rows (CG-Schur)
    loop_points: int = 2048            # loop-neighborhood point set (SearchByProjection Scw)
    sim3_pairs: int = 512              # Sim3 correspondence capacity (SearchBySim3/OptimizeSim3)


@dataclass(frozen=True)
class SystemConfig:
    """Aggregate config: the single source of truth for an engine instance."""

    camera: CameraConfig = field(default_factory=CameraConfig)
    orb: ORBConfig = field(default_factory=ORBConfig)
    matcher: MatcherConfig = field(default_factory=MatcherConfig)
    tracking: TrackingConfig = field(default_factory=TrackingConfig)
    mapping: MappingConfig = field(default_factory=MappingConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    carving: CarvingConfig = field(default_factory=CarvingConfig)
    capacity: CapacityConfig = field(default_factory=CapacityConfig)
    sensor: str = "monocular"          # monocular | stereo | rgbd
    deterministic: bool = True         # inline stages (bit-reproducible); False
                                       # = async stage worker (P1-P5 pipeline)
    use_viewer: bool = False
    seed: int = 0

    def replace(self, **kw) -> "SystemConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Reference-format YAML settings loader
# ---------------------------------------------------------------------------

_OPENCV_YAML_HEADER = re.compile(r"^%YAML[:\s].*$", re.MULTILINE)


def _load_opencv_yaml(path: str) -> dict:
    """Parse a cv::FileStorage YAML file (reference settings format).

    The reference files start with ``%YAML:1.0`` which PyYAML rejects, and may
    contain ``!!opencv-matrix`` tags; both are stripped/ignored.
    """
    import yaml

    with open(path, "r") as f:
        text = f.read()
    text = _OPENCV_YAML_HEADER.sub("", text)
    text = text.replace("!!opencv-matrix", "")
    return yaml.safe_load(text) or {}


def load_settings(path: Optional[str] = None, sensor: str = "monocular", **overrides) -> SystemConfig:
    """Build a :class:`SystemConfig` from a reference-format YAML settings file.

    Mirrors the settings consumed in reference ``src/Tracking.cc:46-145``:
    ``Camera.{fx,fy,cx,cy,k1,k2,p1,p2,k3,bf,fps,RGB}``,
    ``ORBextractor.{nFeatures,scaleFactor,nLevels,iniThFAST,minThFAST}``,
    ``ThDepth``, ``DepthMapFactor``.
    """
    cfg = SystemConfig(sensor=sensor)
    if path is not None:
        d = _load_opencv_yaml(path)

        def g(key, default):
            v = d.get(key, default)
            return default if v is None else v

        cam = CameraConfig(
            fx=float(g("Camera.fx", 517.3)),
            fy=float(g("Camera.fy", 516.5)),
            cx=float(g("Camera.cx", 318.6)),
            cy=float(g("Camera.cy", 255.3)),
            k1=float(g("Camera.k1", 0.0)),
            k2=float(g("Camera.k2", 0.0)),
            p1=float(g("Camera.p1", 0.0)),
            p2=float(g("Camera.p2", 0.0)),
            k3=float(g("Camera.k3", 0.0)),
            width=int(g("Camera.width", 640)),
            height=int(g("Camera.height", 480)),
            fps=float(g("Camera.fps", 30.0)) or 30.0,
            bf=float(g("Camera.bf", 0.0)),
            rgb=bool(int(g("Camera.RGB", 1))),
            th_depth=float(g("ThDepth", 40.0)),
            depth_map_factor=float(g("DepthMapFactor", 5000.0)),
        )
        n_feat = int(g("ORBextractor.nFeatures", 1000))
        orb = ORBConfig(
            n_features=n_feat,
            scale_factor=float(g("ORBextractor.scaleFactor", 1.2)),
            n_levels=int(g("ORBextractor.nLevels", 8)),
            ini_th_fast=int(g("ORBextractor.iniThFAST", 20)),
            min_th_fast=int(g("ORBextractor.minThFAST", 7)),
            n_features_pad=1 << max(8, math.ceil(math.log2(max(n_feat, 1)))),
        )
        fps = cam.fps
        tracking = TrackingConfig(max_frames_between_kf=int(fps))
        cfg = SystemConfig(camera=cam, orb=orb, tracking=tracking, sensor=sensor)
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
