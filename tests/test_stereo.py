"""Stereo + RGB-D front-end and pipeline tests.

The reference validates its stereo/RGB-D paths only by dataset runs
(SURVEY.md section 4); here the synthetic renderer supplies exact depth maps
and exact stereo pairs, so the stereo matcher (``Frame::ComputeStereoMatches``
behavior, ops/stereo.py), the RGB-D depth lookup, the stereo residual rows in
pose optimization / BA, and the metric-scale end-to-end pipelines are all
asserted against closed-form truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.models.frame import FrameBuilder
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.utils.synthetic import (
    SyntheticSequence, render,
)
from orb_slam_free_space_carving_tpu.utils.trajectory import ate_rmse

BASELINE = 0.10  # meters


def _cfg(sensor: str) -> SystemConfig:
    cam = CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                       width=320, height=240,
                       bf=260.0 * BASELINE, th_depth=40.0,
                       depth_map_factor=1.0)
    return SystemConfig(
        camera=cam,
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
        capacity=CapacityConfig(
            max_keyframes=64, max_points=16384,
            local_ba_window=8, local_ba_fixed=4,
            local_ba_points=4096, local_ba_obs=8192,
        ),
        carving=CarvingConfig(grid_resolution=64, ray_samples=64),
        sensor=sensor,
        deterministic=True,
    )


class TestStereoFrontend:
    def test_stereo_match_depth_accuracy(self):
        """Depths recovered by the stereo matcher agree with the z-buffer."""
        cfg = _cfg("stereo")
        seq = SyntheticSequence(cfg.camera, n_frames=2)
        _, img_l, img_r = seq.stereo_frame(0, BASELINE)
        _, _, gt_depth = seq.frame_with_depth(0)

        fb = FrameBuilder(cfg)
        frame = fb.stereo(img_l, img_r)
        d = np.asarray(frame.depth)
        xy = np.asarray(frame.feat.xy)
        valid = np.asarray(frame.feat.valid) & (d > 0)
        assert valid.sum() >= 150, f"only {valid.sum()} stereo depths"

        xi = np.clip(np.round(xy[valid, 0]).astype(int), 0, cfg.camera.width - 1)
        yi = np.clip(np.round(xy[valid, 1]).astype(int), 0, cfg.camera.height - 1)
        gt = gt_depth[yi, xi]
        rel = np.abs(d[valid] - gt) / gt
        assert np.median(rel) < 0.03, f"median depth error {np.median(rel):.3f}"
        # Inlier share: most matched depths within 10%.
        assert (rel < 0.10).mean() > 0.8

    def test_rgbd_depth_lookup(self):
        """RGB-D frames carry the exact depth + virtual right coordinate."""
        cfg = _cfg("rgbd")
        seq = SyntheticSequence(cfg.camera, n_frames=1)
        _, img, depth = seq.frame_with_depth(0)
        fb = FrameBuilder(cfg)
        frame = fb.rgbd(img, depth)
        d = np.asarray(frame.depth)
        ur = np.asarray(frame.u_right)
        valid = np.asarray(frame.feat.valid) & (d > 0)
        assert valid.sum() >= 300
        uv = np.asarray(frame.feat.uv_und)
        # u_right = u - bf/d exactly (Frame.cc:655-660).
        np.testing.assert_allclose(
            ur[valid], uv[valid, 0] - cfg.camera.bf / d[valid], rtol=1e-5
        )


class TestStereoResiduals:
    def test_pose_opt_with_stereo_rows(self, rng):
        """Stereo pose optimization recovers a perturbed pose exactly."""
        from orb_slam_free_space_carving_tpu.ops import pose_opt
        from orb_slam_free_space_carving_tpu.utils import camera, lie

        intr = jnp.asarray([260.0, 260.0, 160.0, 120.0, 0, 0, 0, 0, 0])
        bf = 26.0
        pts = jnp.asarray(
            rng.uniform([-1, -1, 2], [1, 1, 5], size=(80, 3)), jnp.float32
        )
        pose_gt = lie.se3_from_Rt(
            jnp.eye(3, dtype=jnp.float32), jnp.asarray([0.1, -0.05, 0.2], jnp.float32)
        )
        xc = lie.se3_apply(pose_gt, pts)
        uv = camera.project(xc, intr)
        ur = uv[:, 0] - bf / xc[:, 2]
        pose0 = lie.se3_retract(
            pose_gt, jnp.asarray([0.03, -0.02, 0.04, 0.01, -0.02, 0.015])
        )
        res = pose_opt.optimize_pose(
            pose0, pts, uv, jnp.ones(80), jnp.ones(80, bool), intr,
            ur_obs=ur, bf=bf,
        )
        err = np.asarray(res.pose) - np.asarray(pose_gt)
        assert np.abs(err).max() < 1e-3
        assert int(res.n_inliers) == 80

    def test_ba_with_stereo_rows(self, rng):
        """BA with stereo rows converges on a synthetic two-camera bundle."""
        from orb_slam_free_space_carving_tpu.ops import ba
        from orb_slam_free_space_carving_tpu.utils import camera, lie

        intr = jnp.asarray([260.0, 260.0, 160.0, 120.0, 0, 0, 0, 0, 0])
        bf = 26.0
        P = 64
        pts_gt = jnp.asarray(
            rng.uniform([-1, -1, 2], [1, 1, 5], size=(P, 3)), jnp.float32
        )
        poses_gt = jnp.stack([
            lie.se3_identity(),
            lie.se3_from_Rt(jnp.eye(3, dtype=jnp.float32),
                            jnp.asarray([-0.3, 0.0, 0.0], jnp.float32)),
        ])
        obs_cam = jnp.concatenate([jnp.zeros(P, jnp.int32), jnp.ones(P, jnp.int32)])
        obs_point = jnp.concatenate([jnp.arange(P), jnp.arange(P)]).astype(jnp.int32)
        xc = lie.se3_apply(poses_gt[obs_cam], pts_gt[obs_point])
        uv = camera.project(xc, intr)
        ur = uv[:, 0] - bf / xc[:, 2]

        pts0 = pts_gt + jnp.asarray(
            rng.normal(0, 0.05, size=(P, 3)), jnp.float32
        )
        poses0 = poses_gt.at[1].set(
            lie.se3_retract(poses_gt[1],
                            jnp.asarray([0.02, -0.01, 0.03, 0.005, -0.01, 0.008]))
        )
        prob = ba.BAProblem(
            cam_poses=poses0, cam_free=jnp.asarray([False, True]),
            points=pts0, point_valid=jnp.ones(P, bool),
            obs_cam=obs_cam, obs_point=obs_point, obs_uv=uv,
            obs_inv_sigma2=jnp.ones(2 * P), obs_mask=jnp.ones(2 * P, bool),
            obs_ur=ur,
        )
        res = ba.ba_solve(prob, intr, iterations=15, bf=bf)
        pt_err = np.abs(np.asarray(res.points) - np.asarray(pts_gt)).max()
        pose_err = np.abs(np.asarray(res.cam_poses[1]) - np.asarray(poses_gt[1])).max()
        assert pt_err < 5e-3, pt_err
        assert pose_err < 1e-3, pose_err


@pytest.fixture(scope="module")
def stereo_system():
    cfg = _cfg("stereo")
    seq = SyntheticSequence(cfg.camera, n_frames=30)
    sysm = System(cfg)
    for i in range(len(seq)):
        ts, img_l, img_r = seq.stereo_frame(i, BASELINE)
        sysm.track_stereo(img_l, img_r, ts)
    sysm.shutdown()
    return cfg, seq, sysm


@pytest.fixture(scope="module")
def rgbd_system():
    cfg = _cfg("rgbd")
    seq = SyntheticSequence(cfg.camera, n_frames=30)
    sysm = System(cfg)
    for i in range(len(seq)):
        ts, img, depth = seq.frame_with_depth(i)
        sysm.track_rgbd(img, np.where(np.isfinite(depth), depth, 0.0), ts)
    sysm.shutdown()
    return cfg, seq, sysm


class TestStereoPipeline:
    def test_initializes_from_first_frame(self, stereo_system):
        _, _, sysm = stereo_system
        # Stereo init needs no parallax: KF 0 exists at the very first frame.
        assert sysm.map_host.kf_frame_id[0] == 0

    def test_tracks_and_metric_ate(self, stereo_system):
        _, seq, sysm = stereo_system
        ts, poses, states = sysm.frame_trajectory()
        ok = states == trk.OK
        assert ok.sum() >= len(seq) - 3
        est = np.stack([-(np.asarray(_R(p)).T @ p[4:7]) for p in poses[ok]])
        gt = seq.gt_positions()[ok]
        # METRIC ate: no scale alignment — stereo recovers absolute scale.
        ate = ate_rmse(est, gt, with_scale=False)
        assert ate < 0.05, f"metric ATE {ate:.4f} m"


class TestRGBDPipeline:
    def test_tracks_and_metric_ate(self, rgbd_system):
        _, seq, sysm = rgbd_system
        ts, poses, states = sysm.frame_trajectory()
        ok = states == trk.OK
        assert ok.sum() >= len(seq) - 3
        est = np.stack([-(np.asarray(_R(p)).T @ p[4:7]) for p in poses[ok]])
        gt = seq.gt_positions()[ok]
        ate = ate_rmse(est, gt, with_scale=False)
        assert ate < 0.05, f"metric ATE {ate:.4f} m"

    def test_map_has_metric_scale(self, rgbd_system):
        cfg, seq, sysm = rgbd_system
        m = sysm.map_arrays
        valid = np.asarray(m.pt_valid)
        xyz = np.asarray(m.pt_xyz)[valid]
        # Points live inside the synthetic room (extent 4 m, 10% slack).
        assert np.percentile(np.abs(xyz[:, :2]), 95) < 2.4
        assert np.percentile(xyz[:, 2], 95) < 4.4


def _R(pose7):
    from orb_slam_free_space_carving_tpu.utils import lie
    import jax.numpy as jnp

    R, _ = lie.se3_to_Rt(jnp.asarray(pose7))
    return R
