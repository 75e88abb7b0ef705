"""System facade: the public engine API.

Mirrors the reference ``System`` (``src/System.cc``): construction wires the
pipeline stages and cross-pointers (``:101-136``), ``track_monocular`` is the
per-frame entry returning Tcw (``:241-291``), plus localization-mode latches,
reset, shutdown, trajectory writers (``:346-496``) and state queries
(``:498-514``).  Differences by design: stages run inline (deterministic) or
via the async host runtime instead of pthreads; there is no vocabulary file to
load (the BoW stage builds its projection vocabulary procedurally).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig, load_settings
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.models.local_mapping import LocalMapper
from orb_slam_free_space_carving_tpu.models.tracking import (
    LOST, NOT_INITIALIZED, NO_IMAGES_YET, OK, Tracker,
)

MONOCULAR = "monocular"
STEREO = "stereo"
RGBD = "rgbd"


class System:
    def __init__(self, cfg: Optional[SystemConfig] = None,
                 settings_file: Optional[str] = None,
                 sensor: str = MONOCULAR,
                 use_viewer: bool = False,
                 enable_loop_closing: bool = True,
                 enable_carving: bool = True):
        if cfg is None:
            cfg = load_settings(settings_file, sensor=sensor)
        self.cfg = cfg
        self.map_host = ms.MapHost(cfg)
        self._map_ref = [ms.empty_map_arrays(cfg)]
        # Stage runtime: inline (deterministic) or one worker thread owning
        # all map writes (the P1-P5 pipeline, runtime/pipeline.py).  The
        # async path is monocular-only; stereo/RGB-D runs deterministic.
        from orb_slam_free_space_carving_tpu.runtime.pipeline import StageRunner

        self.runner = StageRunner(
            deterministic=cfg.deterministic or sensor != MONOCULAR
        )
        # Detached global-BA worker (reference thread P4, LoopClosing.cc:644):
        # GBA solves concurrently with keyframe processing; writebacks rejoin
        # the map worker's queue.
        self.gba_runner = StageRunner(
            deterministic=self.runner.deterministic, name="gba"
        )

        self.carver = None
        if enable_carving:
            from orb_slam_free_space_carving_tpu.models.carver import Carver

            self.carver = Carver(cfg, self._map_ref, self.map_host)

        self.loop_closer = None
        if enable_loop_closing:
            from orb_slam_free_space_carving_tpu.models.loop_closing import LoopCloser

            self.loop_closer = LoopCloser(cfg, self._map_ref, self.map_host)

        self.local_mapper = LocalMapper(
            cfg, self._map_ref, self.map_host, loop_closer=self.loop_closer
        )
        self.tracker = Tracker(
            cfg, self._map_ref, self.map_host,
            local_mapper=self.local_mapper,
            relocalizer=self.loop_closer,
            runner=self.runner,
        )
        self.tracker.reset_cb = self.reset
        self.local_mapper.runner = self.runner
        # KeyFrameCulling must never erase the tracker's CURRENT reference
        # keyframe: n_ref, ref-KF tracking and the local-buffer refresh all
        # read its observation row from the tracking thread (the reference
        # culls from the LocalMapping thread too but its Tracking re-reads
        # mpReferenceKF through a shared pointer that SetBadFlag leaves
        # readable; here a culled slot is recycled).
        self.local_mapper.protected_kf = lambda: self.tracker.ref_kf
        if self.loop_closer is not None:
            self.loop_closer.local_mapper = self.local_mapper
            self.loop_closer.runner = self.runner
            self.loop_closer.gba_runner = self.gba_runner
            self.loop_closer.on_map_jump = self.tracker._on_map_jump
        self.localization_only = False
        self._prev_img = None
        self._prev_tex_kf = -1
        self._carve_poll_pending = False

        # Streaming + observability (runtime/streaming.py): pose/mesh/status
        # pub-sub (the ROS publisher analog, ros_mono.cc:80-146) and live
        # counters.  Publishing is free when nothing subscribed.
        from orb_slam_free_space_carving_tpu.runtime.streaming import (
            StreamHub, SystemMonitor,
        )

        self.stream = StreamHub()
        self.monitor = SystemMonitor(self)
        if self.carver is not None:
            self.carver.on_mesh = self._on_new_mesh

        self.viewer = None
        if use_viewer:
            from orb_slam_free_space_carving_tpu.models.viewer import Viewer

            self.viewer = Viewer(self)
            self.viewer.start()

    def _on_new_mesh(self, vertices, faces, version: int):
        """Carver hook: fan the new model out to the stream + live drawer."""
        self.stream.publish_mesh(vertices, faces, version)
        if self.viewer is not None:
            self.viewer.model_drawer.set_model(vertices, faces)

    # ------------------------------------------------------------------
    @property
    def map_arrays(self) -> ms.MapArrays:
        return self._map_ref[0]

    def track_monocular(self, img: np.ndarray, timestamp: float) -> np.ndarray:
        """Per-frame entry: grayscale uint8 [H,W] -> pose7 Tcw (np.float32)."""
        if img.ndim == 3:
            img = img.mean(axis=-1).astype(np.uint8)
        pose = self.tracker.track(img, timestamp)
        self._post_track(img)
        # Pose streaming (the per-frame tf broadcast).  np.asarray may sync a
        # device pose — only subscribers pay that cost.
        if self.stream.has_subscribers("pose"):
            self.stream.publish_pose(timestamp, np.asarray(pose),
                                     self.tracker.state)
        return pose

    def _post_track(self, img: np.ndarray):
        """Per-frame carving hooks (Modeler::AddFrameImage/AddTexture +
        Run-loop poll): keep the new keyframe's image for texturing and
        advance the carving stage.  Keyframe decisions lag one frame in the
        async fast path, so the previous image is retained.  In async mode
        the carver runs on the stage worker, AFTER the keyframe's mapping
        item (queue order = the reference's transcript-line ordering)."""
        if self.carver is None:
            return
        t = self.tracker
        kf_recent = t.last_kf_frame_idx >= t.frame_idx - 1
        tex = None
        if t.ref_kf >= 0 and t.ref_kf != self._prev_tex_kf and kf_recent:
            img_kf = img if t.last_kf_frame_idx == t.frame_idx else self._prev_img
            if img_kf is not None:
                tex = (t.ref_kf, img_kf)
                self._prev_tex_kf = t.ref_kf
        self._prev_img = img
        if self.runner.deterministic:
            if tex is not None:
                self.carver.add_texture(*tex)
            self.carver.poll()
        else:
            if tex is not None:
                self.runner.submit(self.carver.add_texture, *tex,
                                   priority=self.runner.DEFERRED)
            # Carving rides the deferred lane (the reference's Modeler
            # thread also lags its transcript under load and recomputes on
            # the >=5s throttle).  One poll is kept in flight at a time:
            # the old backlog<=1 gate starved carving entirely, because
            # keyframes (the only time kf_recent holds) are exactly when
            # BA/fuse work sits on the deferred lane — measured 3 mesh
            # updates over 63 keyframes at mesh_every_kfs=2.  poll() itself
            # enforces the keyframe/time cadence, so an extra submission
            # no-ops.
            if kf_recent and not self._carve_poll_pending:
                self._carve_poll_pending = True

                def _poll_job():
                    try:
                        self.carver.poll()
                    finally:
                        self._carve_poll_pending = False

                self.runner.submit(_poll_job, priority=self.runner.DEFERRED)

    def track_stereo(self, img_l: np.ndarray, img_r: np.ndarray,
                     timestamp: float) -> np.ndarray:
        """Per-frame stereo entry (System::TrackStereo, System.cc:139-189)."""
        if img_l.ndim == 3:
            img_l = img_l.mean(axis=-1).astype(np.uint8)
        if img_r.ndim == 3:
            img_r = img_r.mean(axis=-1).astype(np.uint8)
        pose = self.tracker.track_stereo(img_l, img_r, timestamp)
        self._post_track(img_l)
        return pose

    def track_rgbd(self, img: np.ndarray, depth: np.ndarray,
                   timestamp: float) -> np.ndarray:
        """Per-frame RGB-D entry (System::TrackRGBD, System.cc:191-239)."""
        if img.ndim == 3:
            img = img.mean(axis=-1).astype(np.uint8)
        pose = self.tracker.track_rgbd(img, depth, timestamp)
        self._post_track(img)
        return pose

    # Reference API aliases -------------------------------------------------
    TrackMonocular = track_monocular
    TrackStereo = track_stereo
    TrackRGBD = track_rgbd

    def activate_localization_mode(self):
        """System.cc:293-297 — stop mapping, track only: no keyframe is ever
        created (Tracking.cc:986-991 mbOnlyTracking) and the mapper stage is
        detached."""
        self.localization_only = True
        self.tracker.only_tracking = True
        self.tracker.local_mapper = None

    def deactivate_localization_mode(self):
        self.localization_only = False
        self.tracker.only_tracking = False
        self.tracker.local_mapper = self.local_mapper

    def _flush_pipeline(self):
        """Drain both workers (they enqueue onto each other: keyframe items
        can spawn a GBA solve, whose writeback rejoins the map worker)."""
        for _ in range(4):
            self.runner.flush()
            self.gba_runner.flush()
            if self.runner.is_idle() and self.gba_runner.is_idle():
                break

    def reset(self):
        """System::Reset cascade (Tracking.cc:1514-1561)."""
        self._flush_pipeline()
        if self.carver is not None:
            self.carver.on_reset()
        self.map_host = ms.MapHost(self.cfg)
        self._map_ref[0] = ms.empty_map_arrays(self.cfg)
        self.local_mapper.host = self.map_host
        self.tracker.host = self.map_host
        self.tracker.state = NO_IMAGES_YET
        self.tracker.init_frame = None
        self.tracker.last_frame = None
        self.tracker.velocity = None
        self.tracker._velocity_dev = None
        self.tracker._pending = []
        self.tracker._force_slow = False
        self.tracker._stale_pending = 0
        self.tracker._ref_kf_frame = None
        self.tracker._map_jump_kf = -1
        self.tracker._local_ids_np[:] = 0
        self.tracker._local_mask_np[:] = False
        self.tracker._local_ids = jnp.zeros_like(self.tracker._local_ids)
        self.tracker._local_mask = jnp.zeros_like(self.tracker._local_mask)
        self.tracker._track_pt_dev = None
        self.tracker.last_track_pt = None
        self.tracker._last_good_pose = None
        self.tracker.ref_kf = -1
        self.local_mapper.recent_points = []
        self.local_mapper.kf_counter = 0
        self.local_mapper._word_cache = {}
        if self.loop_closer is not None:
            self.loop_closer.host = self.map_host
            self.loop_closer.reset()
        if self.carver is not None:
            self.carver.host = self.map_host

    def shutdown(self):
        """Flush async stages + lagged decisions; finalize the carving mesh
        (System::Shutdown joins the stage threads, System.cc:324-344)."""
        self.tracker._flush_pending()
        self._flush_pipeline()
        self.tracker.finalize_trajectory()
        if self.carver is not None:
            self.carver.finalize()
        if self.viewer is not None:
            self.viewer.stop()
        self.gba_runner.shutdown()
        self.runner.shutdown()

    # ------------------------------------------------------------------
    def get_tracking_state(self) -> int:
        return self.tracker.state

    def get_tracked_points(self) -> int:
        return self.tracker.n_tracked

    def keyframe_trajectory(self):
        """(timestamps, poses7 Tcw) of valid keyframes, ordered by frame id."""
        host = self.map_host
        kfs = host.valid_kf_list()
        order = np.argsort(host.kf_frame_id[kfs])
        kfs = kfs[order]
        poses = np.asarray(self.map_arrays.kf_pose)[kfs]
        return host.kf_timestamp[kfs], poses

    def save_keyframe_trajectory_tum(self, path: str):
        """System::SaveKeyFrameTrajectoryTUM (System.cc:407-441)."""
        from orb_slam_free_space_carving_tpu.utils import trajectory

        ts, poses = self.keyframe_trajectory()
        trajectory.save_trajectory_tum(path, ts, poses)

    def save_trajectory_tum(self, path: str):
        from orb_slam_free_space_carving_tpu.utils import trajectory

        self.tracker.finalize_trajectory()
        traj = self.tracker.trajectory
        ts = [t for t, _, s in traj if s == OK]
        poses = np.stack([p for _, p, s in traj if s == OK])
        trajectory.save_trajectory_tum(path, ts, poses)

    def frame_trajectory(self):
        """(timestamps, poses7, states) for every tracked frame."""
        self.tracker.finalize_trajectory()
        traj = self.tracker.trajectory
        ts = np.array([t for t, _, _ in traj])
        poses = np.stack([p for _, p, _ in traj]) if traj else np.zeros((0, 7))
        states = np.array([s for _, _, s in traj])
        return ts, poses, states

    def save_mesh_obj(self, path: str):
        if self.carver is not None:
            self.carver.save_obj(path)

    def save_textured_mesh_obj(self, path: str):
        """Textured mesh export (ModelDrawer textured draw + TextureFrame)."""
        if self.carver is not None:
            self.carver.save_textured_obj(path)

    # ------------------------------------------------------------------
    # Map checkpoint / resume (the reference's acknowledged TODO,
    # include/System.h:125-127; SURVEY.md section 5 checkpoint/resume)
    # ------------------------------------------------------------------
    def save_map(self, path: str):
        """Snapshot the full map state (device arrays + host registry) to one
        ``.npz``.  Together with the replayable CARV transcript
        (``carver.write_transcript``) this is the event-sourced checkpoint the
        reference only half-implements."""
        m = self.map_arrays
        host = self.map_host
        arrays = {f"dev_{k}": np.asarray(v) for k, v in m._asdict().items()}
        arrays.update(
            host_ctr_visible=np.asarray(host.ctr_visible),
            host_ctr_found=np.asarray(host.ctr_found),
            host_kf_valid=host.kf_valid, host_kf_frame_id=host.kf_frame_id,
            host_kf_timestamp=host.kf_timestamp, host_obs_pt=host.obs_pt,
            host_pt_valid=host.pt_valid, host_covis=host.covis,
            host_parent=host.parent, host_n_kf_slots=np.int64(host.n_kf_slots),
            host_kf_seq=host.kf_seq,
            host_n_kf_created=np.int64(host.n_kf_created),
            loop_edges_i=np.array(
                [i for i, js in host.loop_edges.items() for _ in js], np.int64),
            loop_edges_j=np.array(
                [j for _, js in host.loop_edges.items() for j in js], np.int64),
        )
        np.savez_compressed(path, **arrays)

    def load_map(self, path: str):
        """Restore a map snapshot; tracking resumes via relocalization (the
        localization-from-saved-map mode the reference lacks)."""
        import jax.numpy as jnp

        data = np.load(path)
        fields = {
            k[4:]: jnp.asarray(v) for k, v in data.items() if k.startswith("dev_")
        }
        self._map_ref[0] = ms.MapArrays(**fields)
        host = self.map_host
        if "host_ctr_visible" in data:
            host.ctr_visible = jnp.asarray(data["host_ctr_visible"])
            host.ctr_found = jnp.asarray(data["host_ctr_found"])
        host.kf_valid = data["host_kf_valid"]
        host.kf_frame_id = data["host_kf_frame_id"]
        host.kf_timestamp = data["host_kf_timestamp"]
        host.obs_pt = data["host_obs_pt"]
        host.pt_valid = data["host_pt_valid"]
        host.covis = data["host_covis"]
        host.parent = data["host_parent"]
        host.n_kf_slots = int(data["host_n_kf_slots"])
        if "host_kf_seq" in data:
            host.kf_seq = data["host_kf_seq"]
            host.n_kf_created = int(data["host_n_kf_created"])
        else:                          # older snapshots: synthesize by frame id
            order = np.argsort(host.kf_frame_id)
            host.kf_seq = np.full_like(host.kf_frame_id, -1)
            host.kf_seq[order] = np.arange(len(order))
            host.n_kf_created = int(host.kf_valid.sum())
        host.pt_free = [
            int(i) for i in np.where(~host.pt_valid)[0][::-1]
        ]
        host.loop_edges = {}
        for i, j in zip(data["loop_edges_i"], data["loop_edges_j"]):
            host.loop_edges.setdefault(int(i), set()).add(int(j))
        # Rebuild the loop-closer BoW database from stored descriptors.
        if self.loop_closer is not None:
            self.loop_closer.rebuild_database()
        # Tracking must relocalize into the restored map.
        self.tracker.state = LOST if host.kf_valid.any() else NO_IMAGES_YET
        self.tracker.ref_kf = int(np.argmax(host.kf_frame_id))
        self.tracker.velocity = None
        self.tracker.frame_idx = int(host.kf_frame_id.max()) if host.kf_valid.any() else -1
        self.tracker.last_kf_frame_idx = self.tracker.frame_idx
