"""Loop closure component tests: Sim3 pose graph, Horn RANSAC, relocalization.

Synthetic closed-form cases (SURVEY.md section 4 test strategy): a drifted
odometry chain with one exact loop edge must snap back; Horn alignment must
recover a known Sim3; relocalization must recover the pose of a frame after
tracking is lost.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.ops import horn, posegraph
from orb_slam_free_space_carving_tpu.utils import lie


@pytest.fixture()
def rng():
    return np.random.default_rng(3)


def _circle_poses(n, radius=3.0):
    """Ground-truth Tcw chain on a circle (camera looks inward)."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        c = np.array([radius * np.cos(a), 0.0, radius * np.sin(a)])
        yaw = -a
        q = lie.so3_exp_quat(jnp.asarray([0.0, yaw, 0.0], jnp.float32))
        R = lie.quat_to_matrix(q)
        t = -np.asarray(R) @ c
        poses.append(np.concatenate([np.asarray(q), t]).astype(np.float32))
    return jnp.asarray(np.stack(poses))


class TestPoseGraph:
    def test_loop_edge_removes_drift(self):
        n = 24
        gt = _circle_poses(n)
        gt_sim = lie.sim3_from_se3(gt)

        # Odometry with a per-step bias -> integrated drift.
        drift = jnp.asarray([0.015, 0.0, -0.01, 0.0, 0.004, 0.0, 0.002])
        est = [gt[0]]
        for i in range(1, n):
            rel_true = lie.se3_compose(gt[i], lie.se3_inverse(gt[i - 1]))
            rel_noisy = lie.se3_compose(lie.se3_exp(drift[:6]), rel_true)
            est.append(lie.se3_compose(rel_noisy, est[-1]))
        est = jnp.stack(est)
        end_err0 = float(jnp.linalg.norm(
            lie.se3_log(lie.se3_compose(est[-1], lie.se3_inverse(gt[-1])))
        ))
        assert end_err0 > 0.1  # real drift

        sims = lie.sim3_from_se3(est)
        # Edges: consecutive odometry (measured = drifted relatives, i.e.
        # consistent with est) + one loop edge with the TRUE relative.
        ei, ej, rel = [], [], []
        for i in range(1, n):
            ei.append(i)
            ej.append(i - 1)
            rel.append(lie.sim3_compose(sims[i], lie.sim3_inverse(sims[i - 1])))
        ei.append(n - 1)
        ej.append(0)
        rel.append(lie.sim3_compose(gt_sim[n - 1], lie.sim3_inverse(gt_sim[0])))
        E = len(ei)
        fixed = np.zeros(n, bool)
        fixed[0] = True
        out = posegraph.optimize_essential_graph(
            sims, jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.stack(rel), jnp.ones(E, bool), jnp.asarray(fixed),
            iterations=15,
        )
        out_se3 = lie.sim3_to_se3(out)
        end_err = float(jnp.linalg.norm(
            lie.se3_log(lie.se3_compose(out_se3[-1], lie.se3_inverse(gt[-1])))
        ))
        # The loop edge should pull the endpoint near truth; interior nodes
        # distribute the residual drift.
        assert end_err < 0.25 * end_err0, (end_err0, end_err)

    def test_scale_drift_corrected(self):
        """Monocular scale drift: estimates with exponentially growing scale
        + one scale-true loop edge (the reason the essential graph is Sim3,
        Optimizer.cc:794-)."""
        n = 16
        gt = _circle_poses(n)
        gt_sim = lie.sim3_from_se3(gt)
        # Inject scale drift into estimates.
        scales = 1.02 ** np.arange(n)
        est_sim = np.asarray(lie.sim3_from_se3(gt)).copy()
        est_sim[:, 4:7] *= scales[:, None]
        est_sim[:, 7] = scales
        est_sim = jnp.asarray(est_sim)

        ei, ej, rel = [], [], []
        for i in range(1, n):
            ei.append(i)
            ej.append(i - 1)
            rel.append(lie.sim3_compose(est_sim[i], lie.sim3_inverse(est_sim[i - 1])))
        ei.append(n - 1)
        ej.append(0)
        rel.append(lie.sim3_compose(gt_sim[n - 1], lie.sim3_inverse(gt_sim[0])))
        fixed = np.zeros(n, bool)
        fixed[0] = True
        out = posegraph.optimize_essential_graph(
            est_sim, jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.stack(rel), jnp.ones(len(ei), bool), jnp.asarray(fixed),
            iterations=15,
        )
        final_scale = float(out[-1, 7])
        # Drifted end scale was 1.35; the loop edge must pull it near 1.
        assert abs(final_scale - 1.0) < 0.05


class TestHorn:
    def test_recovers_known_sim3(self, rng):
        x = jnp.asarray(rng.normal(0, 2, (50, 3)).astype(np.float32))
        gt = jnp.asarray([0.95, 0.2, 0.1, 0.15, 0.5, -0.3, 0.8, 1.7])
        gt = gt.at[:4].set(lie.quat_normalize(gt[:4]))
        y = lie.sim3_apply(gt, x)
        est = horn.horn_alignment(x, y)
        yy = lie.sim3_apply(est, x)
        assert float(jnp.max(jnp.linalg.norm(yy - y, axis=-1))) < 1e-3
        assert abs(float(est[7]) - 1.7) < 1e-3

    def test_ransac_with_outliers(self, rng):
        intr = jnp.asarray([500.0, 500, 320, 240, 0, 0, 0, 0, 0])
        x = rng.normal(0, 1, (100, 3)).astype(np.float32)
        x[:, 2] += 5.0
        gt = jnp.asarray([1.0, 0.02, -0.03, 0.01, 0.3, -0.2, 0.4, 1.25])
        gt = gt.at[:4].set(lie.quat_normalize(gt[:4]))
        y = np.asarray(lie.sim3_apply(gt, jnp.asarray(x))).copy()
        y[:25] += rng.normal(0, 3, (25, 3))  # 25% outliers
        res = horn.solve_sim3_ransac(
            jnp.asarray(y), jnp.asarray(x), jnp.ones(100, bool), intr,
            jax.random.PRNGKey(0),
        )
        assert bool(res.ok)
        assert int(res.inliers[:25].sum()) < 6
        assert abs(float(res.sim_12[7]) - 1.25) < 0.05


class TestRelocalization:
    def test_relocalize_after_lost(self):
        """Track the synthetic sequence, force LOST, then relocalize on a
        revisited view (Tracking.cc:1350-1511 behavior)."""
        import sys
        sys.path.insert(0, "/root/repo")
        from tests.test_pipeline import _cfg
        from orb_slam_free_space_carving_tpu.models.system import System
        from orb_slam_free_space_carving_tpu.models import tracking as trk
        from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

        cfg = _cfg()
        seq = SyntheticSequence(cfg.camera, n_frames=30)
        s = System(cfg, enable_carving=False)
        for i in range(20):
            ts, img = seq.frame(i)
            s.track_monocular(img, ts)
        assert s.get_tracking_state() == trk.OK

        # Kidnap: blank frames break tracking.
        blank = np.zeros((cfg.camera.height, cfg.camera.width), np.uint8)
        for i in range(3):
            s.track_monocular(blank, 20.0 + i)
        assert s.get_tracking_state() == trk.LOST

        # Revisit a seen view: must relocalize within a few frames.
        states = []
        for i in range(10, 14):
            ts, img = seq.frame(i)
            s.track_monocular(img, 30.0 + i)
            states.append(s.get_tracking_state())
        assert trk.OK in states, states
