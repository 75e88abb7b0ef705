"""Sharded-vs-single-device parity on the virtual 8-device CPU mesh.

SURVEY.md section 4's multi-host test recipe: the distributed paths must
produce the same numerics as their single-device counterparts (tolerance for
reduction-order effects).  Covers the two sharded stages of SURVEY section
2.4's "New" row: observation-sharded CG-Schur BA and ray-sharded carving —
plus the global-BA service, which routes through the sharded path whenever
more than one device is visible (as in this suite).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.ops import ba, carving
from orb_slam_free_space_carving_tpu.parallel import sharded
from orb_slam_free_space_carving_tpu.utils import camera, lie

from test_solvers import _make_ba_problem, INTR, rng  # noqa: F401


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide the virtual mesh"
    return sharded.make_mesh(8)


class TestShardedBA:
    def test_matches_single_device(self, rng, mesh):
        # Observation count divisible by 8 (C*P = 6*120 = 720 = 8*90).
        prob, poses_gt, pts_gt = _make_ba_problem(rng)
        res1 = ba.ba_solve_cg(prob, INTR, iterations=10, cg_iterations=30)
        res8 = sharded.ba_solve_sharded(prob, INTR, mesh, iterations=10)

        p1, p8 = np.asarray(res1.cam_poses), np.asarray(res8.cam_poses)
        x1, x8 = np.asarray(res1.points), np.asarray(res8.points)
        assert np.allclose(p1, p8, atol=5e-4), np.abs(p1 - p8).max()
        assert np.allclose(x1, x8, atol=5e-3), np.abs(x1 - x8).max()

    def test_sharded_recovers_bundle(self, rng, mesh):
        prob, poses_gt, pts_gt = _make_ba_problem(rng)
        res = sharded.ba_solve_sharded(prob, INTR, mesh, iterations=10)
        err = np.linalg.norm(
            np.asarray(res.cam_poses[2:, 4:7]) - np.asarray(poses_gt[2:, 4:7]),
            axis=-1,
        )
        assert err.max() < 2e-2

    def test_outputs_fully_addressable(self, rng, mesh):
        prob, _, _ = _make_ba_problem(rng)
        res = sharded.ba_solve_sharded(prob, INTR, mesh, iterations=2)
        # Downstream host writeback requires replicated/gatherable results.
        _ = np.asarray(res.cam_poses)
        _ = np.asarray(res.points)


class TestShardedCarving:
    def _rays(self, rng, B=1024):
        origins = np.zeros((B, 3), np.float32)
        origins[:, 2] = -2.0
        targets = np.stack([
            rng.uniform(-1, 1, B),
            rng.uniform(-1, 1, B),
            rng.uniform(1.5, 2.0, B),
        ], axis=-1).astype(np.float32)
        mask = np.ones(B, bool)
        lo = jnp.asarray([-2.0, -2.0, -3.0], jnp.float32)
        hi = jnp.asarray([2.0, 2.0, 3.0], jnp.float32)
        return jnp.asarray(origins), jnp.asarray(targets), jnp.asarray(mask), lo, hi

    def test_matches_single_device(self, rng, mesh):
        o, t, mk, lo, hi = self._rays(rng)
        v1, e1 = carving.carve_votes(o, t, mk, lo, hi, resolution=32,
                                     n_samples=48)
        v8, e8 = sharded.carve_sharded(o, t, mk, lo, hi, mesh, resolution=32,
                                       n_samples=48)
        assert np.array_equal(np.asarray(v1), np.asarray(v8))
        assert np.array_equal(np.asarray(e1), np.asarray(e8))


class TestGlobalBAUsesSharding:
    def test_global_ba_runs_sharded_and_improves(self, rng, mesh):
        """GlobalBA routes through the sharded path when >1 device is
        visible; end-to-end it must reduce the robust cost on a perturbed
        full-map state."""
        from orb_slam_free_space_carving_tpu.config import (
            CameraConfig, CapacityConfig, ORBConfig, SystemConfig,
        )
        from orb_slam_free_space_carving_tpu.models import map_state as ms
        from orb_slam_free_space_carving_tpu.models.global_ba import (
            GlobalBA, build_global_problem,
        )

        cfg = SystemConfig(
            camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0,
                                width=640, height=480),
            orb=ORBConfig(n_features=64, n_levels=4, n_features_pad=64),
            capacity=CapacityConfig(max_keyframes=8, max_points=256,
                                    gba_obs=1024, local_ba_obs=256),
        )
        m = ms.empty_map_arrays(cfg)
        host = ms.MapHost(cfg)

        C, P = 6, 60
        pts_gt = np.stack([
            rng.uniform(-3, 3, P), rng.uniform(-2, 2, P),
            rng.uniform(4, 8, P),
        ], axis=-1).astype(np.float32)
        kf_uv = np.zeros((8, 64, 2), np.float32)
        obs = np.full((8, 64), -1, np.int32)
        poses = []
        for c in range(C):
            kf = host.alloc_keyframe()
            q = np.asarray(lie.so3_exp_quat(
                jnp.asarray(rng.normal(0, 0.01, 3), jnp.float32)))
            pose = np.concatenate([q, [0.3 * c, 0.0, 0.0]]).astype(np.float32)
            poses.append(pose)
            uv = np.asarray(camera.project(
                lie.se3_apply(jnp.asarray(pose), jnp.asarray(pts_gt)),
                jnp.asarray([500.0, 500, 320, 240, 0, 0, 0, 0, 0]),
            ))
            kf_uv[kf, :P] = uv + rng.normal(0, 0.3, uv.shape)
            obs[kf, :P] = np.arange(P)
            host.kf_frame_id[kf] = c
        host.obs_pt[:] = obs
        host.pt_valid[:P] = True

        pose_pert = np.stack(poses)
        pose_pert[2:, 4:] += rng.normal(0, 0.03, (C - 2, 3)).astype(np.float32)
        m = m._replace(
            kf_pose=m.kf_pose.at[:C].set(jnp.asarray(pose_pert)),
            kf_valid=m.kf_valid.at[:C].set(True),
            kf_uv=jnp.asarray(kf_uv),
            kf_feat_valid=m.kf_feat_valid.at[:C, :P].set(True),
            obs_pt=jnp.asarray(obs),
            pt_xyz=m.pt_xyz.at[:P].set(
                jnp.asarray(pts_gt + rng.normal(0, 0.05, pts_gt.shape)
                            .astype(np.float32))
            ),
            pt_valid=m.pt_valid.at[:P].set(True),
            pt_ref_kf=m.pt_ref_kf.at[:P].set(0),
        )

        intr = jnp.asarray([500.0, 500, 320, 240, 0, 0, 0, 0, 0], jnp.float32)
        prob0, _ = build_global_problem(cfg, m, host)
        cost0 = float(ba.ba_solve_cg(prob0, intr, iterations=0).cost)

        gba = GlobalBA(cfg)
        m2 = gba.run(m, host, intr)
        assert gba.n_runs == 1
        prob1, _ = build_global_problem(cfg, m2, host)
        cost1 = float(ba.ba_solve_cg(prob1, intr, iterations=0).cost)
        assert cost1 < 0.5 * cost0, (cost0, cost1)

    def test_generation_supersede_discards(self, rng, mesh):
        from orb_slam_free_space_carving_tpu.config import (
            CapacityConfig, ORBConfig, SystemConfig,
        )
        from orb_slam_free_space_carving_tpu.models import map_state as ms
        from orb_slam_free_space_carving_tpu.models.global_ba import GlobalBA

        cfg = SystemConfig(
            orb=ORBConfig(n_features=64, n_levels=4, n_features_pad=64),
            capacity=CapacityConfig(max_keyframes=8, max_points=256,
                                    gba_obs=1024, local_ba_obs=256),
        )
        m = ms.empty_map_arrays(cfg)
        host = ms.MapHost(cfg)
        gba = GlobalBA(cfg)

        # Not enough observations -> no-op, no run counted.
        m2 = gba.run(m, host, jnp.asarray([500.0, 500, 320, 240, 0, 0, 0, 0, 0]))
        assert gba.n_runs == 0
        assert m2 is m
