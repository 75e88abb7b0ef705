"""Unit tests for the geometric solver family on synthetic closed-form scenes.

The reference has no tests (SURVEY.md section 4); these supply the per-kernel
coverage the TPU build needs: triangulation, two-view bootstrap RANSAC,
motion-only pose GN, Schur-complement BA — each against synthetic geometry
with a known optimum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.ops import ba, pose_opt, triangulation as tri, twoview
from orb_slam_free_space_carving_tpu.utils import camera, lie

INTR = jnp.array([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0, 0], jnp.float32)


@pytest.fixture()
def rng():
    """Per-test rng (hermetic: each test sees the same stream regardless of
    execution order — overrides the session fixture)."""
    return np.random.default_rng(42)


def _random_scene(rng, n=200, depth=(4.0, 8.0)):
    pts = np.stack(
        [
            rng.uniform(-3, 3, n),
            rng.uniform(-2, 2, n),
            rng.uniform(*depth, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return jnp.asarray(pts)


def _pose(rvec, tvec):
    q = lie.so3_exp_quat(jnp.asarray(rvec, jnp.float32))
    return jnp.concatenate([q, jnp.asarray(tvec, jnp.float32)])


def _project(pose, pts):
    return camera.project(lie.se3_apply(pose, pts), INTR)


class TestTriangulation:
    def test_dlt_recovers_points(self, rng):
        pts = _random_scene(rng)
        p1 = _pose([0, 0, 0], [0, 0, 0])
        p2 = _pose([0.02, -0.01, 0.03], [0.3, 0.05, 0.02])
        uv1 = _project(p1, pts)
        uv2 = _project(p2, pts)
        P1 = tri.projection_matrix(p1, INTR)
        P2 = tri.projection_matrix(p2, INTR)
        X = tri.triangulate_dlt(uv1, uv2, P1, P2)
        # f32 DLT alone has ~0.5% depth error; GN polish reaches noise floor.
        assert float(jnp.median(jnp.linalg.norm(X - pts, axis=-1))) < 5e-2
        Xr = tri.refine_triangulation(X, uv1, uv2, p1, p2, INTR)
        assert float(jnp.max(jnp.linalg.norm(Xr - pts, axis=-1))) < 2e-3

    def test_checks_reject_behind_camera(self, rng):
        pts = _random_scene(rng, n=50)
        bad = pts.at[:10, 2].set(-5.0)  # behind both cameras
        p1 = _pose([0, 0, 0], [0, 0, 0])
        p2 = _pose([0, 0, 0], [0.3, 0, 0])
        uv1 = _project(p1, bad)
        uv2 = _project(p2, bad)
        ones = jnp.ones(50)
        ok = tri.check_triangulation(bad, p1, p2, INTR, uv1, uv2, ones, ones)
        assert not bool(ok[:10].any())
        assert bool(ok[10:].mean() > 0.8)


class TestTwoView:
    def test_pure_translation_bootstrap(self, rng):
        pts = _random_scene(rng, n=200)
        p1 = _pose([0, 0, 0], [0, 0, 0])
        p2 = _pose([0.03, 0.02, -0.01], [0.5, 0.1, 0.05])
        uv1 = _project(p1, pts)
        uv2 = _project(p2, pts)
        key = jax.random.PRNGKey(0)
        noise = 0.5 * jax.random.normal(key, uv1.shape)
        res = twoview.initialize_two_view(
            uv1 + noise, uv2 - noise, jnp.ones(200, bool), INTR,
            jax.random.PRNGKey(1),
        )
        assert bool(res.ok)
        # Rotation error small:
        R_est = lie.quat_to_matrix(res.pose21[:4])
        R_gt = lie.quat_to_matrix(p2[:4])
        ang = np.degrees(
            np.arccos(np.clip((np.trace(np.asarray(R_est.T @ R_gt)) - 1) / 2, -1, 1))
        )
        assert ang < 1.0
        # Translation direction matches up to the monocular scale gauge:
        t_est = np.asarray(res.pose21[4:7])
        t_gt = np.asarray(p2[4:7])
        cos = abs(t_est @ t_gt / (np.linalg.norm(t_est) * np.linalg.norm(t_gt)))
        # 8-point F with 0.5 px noise leaves ~10 deg of translation-direction
        # error; like the reference, the init-map BA (20 its, TestBA) is what
        # polishes geometry afterwards (Tracking.cc:695).
        assert cos > 0.97
        assert int(res.inliers.sum()) > 150

    def test_outlier_contamination(self, rng):
        pts = _random_scene(rng, n=200)
        p1 = _pose([0, 0, 0], [0, 0, 0])
        p2 = _pose([0, 0.01, 0], [0.4, 0.0, 0.0])
        uv1 = _project(p1, pts)
        uv2 = _project(p2, pts)
        # 25% gross outliers
        k = jax.random.PRNGKey(2)
        uv2 = uv2.at[:50].set(jax.random.uniform(k, (50, 2)) * 500.0)
        res = twoview.initialize_two_view(
            uv1, uv2, jnp.ones(200, bool), INTR, jax.random.PRNGKey(3),
            min_triangulated_ratio=0.5,
        )
        assert bool(res.ok)
        assert int(res.inliers[:50].sum()) < 5
        assert int(res.inliers[50:].sum()) > 120


class TestPoseOpt:
    def test_converges_from_perturbed_pose(self, rng):
        pts = _random_scene(rng, n=300)
        gt = _pose([0.1, -0.05, 0.08], [0.2, -0.1, 0.3])
        uv = _project(gt, pts)
        pert = lie.se3_retract(gt, jnp.asarray([0.05, -0.04, 0.06, 0.02, -0.015, 0.01]))
        res = pose_opt.optimize_pose(
            pert, pts, uv, jnp.ones(300), jnp.ones(300, bool), INTR
        )
        err = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(gt)))
        assert float(jnp.linalg.norm(err)) < 1e-4
        assert int(res.n_inliers) == 300

    def test_outliers_rejected(self, rng):
        pts = _random_scene(rng, n=300)
        gt = _pose([0, 0, 0], [0.1, 0, 0.2])
        uv = _project(gt, pts)
        uv = uv.at[:60].add(40.0)  # gross outliers
        pert = lie.se3_retract(gt, jnp.asarray([0.02, 0.01, -0.02, 0.01, 0.005, -0.01]))
        res = pose_opt.optimize_pose(
            pert, pts, uv, jnp.ones(300), jnp.ones(300, bool), INTR
        )
        assert int(res.inliers[:60].sum()) == 0
        err = lie.se3_log(lie.se3_compose(res.pose, lie.se3_inverse(gt)))
        assert float(jnp.linalg.norm(err)) < 1e-3


def _make_ba_problem(rng, C=6, P=120, noise_px=0.3, pose_noise=0.02, pt_noise=0.05):
    pts_gt = _random_scene(rng, n=P)
    poses_gt = []
    for i in range(C):
        poses_gt.append(
            _pose(rng.normal(0, 0.02, 3), [0.25 * i, 0.02 * i, 0.01 * i])
        )
    poses_gt = jnp.stack(poses_gt)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(C):
        uv = _project(poses_gt[c], pts_gt)
        uv = uv + rng.normal(0, noise_px, uv.shape).astype(np.float32)
        for p in range(P):
            obs_cam.append(c)
            obs_pt.append(p)
        obs_uv.append(uv)
    obs_uv = jnp.concatenate(obs_uv)
    O = len(obs_cam)

    k = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(k)
    pose_pert = pose_noise * jax.random.normal(k1, (C, 6))
    pose_pert = pose_pert.at[0].set(0.0).at[1].set(0.0)  # keep anchors exact
    poses0 = jax.vmap(lie.se3_retract)(poses_gt, pose_pert)
    pts0 = pts_gt + pt_noise * jax.random.normal(k2, (P, 3))

    prob = ba.BAProblem(
        cam_poses=poses0,
        cam_free=jnp.arange(C) >= 2,      # first two cameras fixed (gauge)
        points=pts0,
        point_valid=jnp.ones(P, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_pt, jnp.int32),
        obs_uv=obs_uv,
        obs_inv_sigma2=jnp.ones(O),
        obs_mask=jnp.ones(O, bool),
    )
    return prob, poses_gt, pts_gt


class TestBA:
    @pytest.mark.parametrize("solver,tol", [(ba.ba_solve, 8e-3), (ba.ba_solve_cg, 2e-2)])
    def test_recovers_bundle(self, rng, solver, tol):
        prob, poses_gt, pts_gt = _make_ba_problem(rng)
        res = solver(prob, INTR, iterations=15)
        # Free camera poses close to ground truth.
        for c in range(2, prob.cam_poses.shape[0]):
            err = lie.se3_log(
                lie.se3_compose(res.cam_poses[c], lie.se3_inverse(poses_gt[c]))
            )
            # Noise floor: 0.3 px observation noise bounds recovery accuracy;
            # the CG variant is looser (30 inner iterations, Jacobi precond).
            assert float(jnp.linalg.norm(err)) < tol
        pt_err = jnp.linalg.norm(res.points - pts_gt, axis=-1)
        assert float(jnp.median(pt_err)) < 2e-2

    def test_cost_decreases(self, rng):
        prob, *_ = _make_ba_problem(rng, pose_noise=0.05, pt_noise=0.2)
        res0 = ba.ba_solve(prob, INTR, iterations=1)
        res = ba.ba_solve(prob, INTR, iterations=12)
        assert float(res.cost) < float(res0.cost)

    def test_masked_obs_ignored(self, rng):
        prob, poses_gt, _ = _make_ba_problem(rng)
        # Corrupt half the observations of camera 3 but mask them out.
        bad = (prob.obs_cam == 3) & (prob.obs_point < 60)
        prob = prob._replace(
            obs_uv=jnp.where(bad[:, None], prob.obs_uv + 500.0, prob.obs_uv),
            obs_mask=prob.obs_mask & ~bad,
        )
        res = ba.ba_solve(prob, INTR, iterations=15)
        err = lie.se3_log(
            lie.se3_compose(res.cam_poses[3], lie.se3_inverse(poses_gt[3]))
        )
        # Camera 3 retains 60 clean observations — must stay near truth.
        assert float(jnp.linalg.norm(err)) < 1e-2
