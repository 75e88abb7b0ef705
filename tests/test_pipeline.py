"""End-to-end pipeline integration tests on the synthetic sequence.

The capability the reference validates only by hand (dataset runs scored
offline, SURVEY.md section 4) becomes an automated integration test: track a
synthetic room sequence with exact ground truth, assert ATE, map growth, mesh
output, and export formats.
"""

import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence
from orb_slam_free_space_carving_tpu.utils.trajectory import ate_rmse


def _cfg() -> SystemConfig:
    return SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
        capacity=CapacityConfig(
            max_keyframes=64, max_points=16384,
            local_ba_window=8, local_ba_fixed=4,
            local_ba_points=4096, local_ba_obs=8192,
        ),
        carving=CarvingConfig(grid_resolution=64, ray_samples=64),
        deterministic=True,
    )


@pytest.fixture(scope="module")
def tracked_system():
    cfg = _cfg()
    seq = SyntheticSequence(cfg.camera, n_frames=40)
    sysm = System(cfg)
    for ts, img in seq:
        sysm.track_monocular(img, ts)
    sysm.shutdown()
    return cfg, seq, sysm


class TestPipeline:
    def test_tracks_most_frames(self, tracked_system):
        _, seq, sysm = tracked_system
        _, _, states = sysm.frame_trajectory()
        assert (states == trk.OK).sum() >= len(seq) - 5

    def test_ate_below_threshold(self, tracked_system):
        _, seq, sysm = tracked_system
        from orb_slam_free_space_carving_tpu.utils import lie
        import jax.numpy as jnp

        ts, poses, states = sysm.frame_trajectory()
        ok = states == trk.OK
        est = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
        gt = seq.gt_positions()[ok]
        ate = ate_rmse(est, gt, with_scale=True)
        # Room is ~4 m; trajectory radius 0.4 m.  5 cm is the smoke gate.
        assert ate < 0.05, f"ATE {ate:.4f} m"

    def test_map_grows(self, tracked_system):
        _, _, sysm = tracked_system
        assert int(sysm.map_host.kf_valid.sum()) >= 5
        assert int(sysm.map_host.pt_valid.sum()) >= 500

    def test_mesh_produced(self, tracked_system, tmp_path):
        _, _, sysm = tracked_system
        assert sysm.carver.vertices is not None
        assert len(sysm.carver.vertices) > 50
        p = tmp_path / "mesh.obj"
        sysm.save_mesh_obj(str(p))
        lines = p.read_text().splitlines()
        assert any(l.startswith("v ") for l in lines)
        assert any(l.startswith("f ") for l in lines)

    def test_mesh_near_true_surfaces(self, tracked_system):
        """Mesh-agreement smoke: most mesh vertices lie near a true room
        surface (after the similarity alignment that monocular scale needs)."""
        _, seq, sysm = tracked_system
        from orb_slam_free_space_carving_tpu.utils import lie, trajectory
        import jax.numpy as jnp

        ts, poses, states = sysm.frame_trajectory()
        ok = states == trk.OK
        est = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
        gt = seq.gt_positions()[ok]
        s, R, t = trajectory.umeyama_alignment(est, gt, with_scale=True)
        v = sysm.carver.vertices
        v_aligned = (s * (R @ v.T)).T + t

        # Distance to the closest room plane (the scene is axis-aligned quads).
        d = np.full(len(v_aligned), np.inf)
        for q in seq.scene:
            n = q.normal
            dist = np.abs((v_aligned - q.origin) @ n)
            # Inside the quad's extent (with margin)?
            rel = v_aligned - q.origin
            a = rel @ q.eu / (q.eu @ q.eu)
            b = rel @ q.ev / (q.ev @ q.ev)
            inside = (a > -0.1) & (a < 1.1) & (b > -0.1) & (b < 1.1)
            d = np.where(inside, np.minimum(d, dist), d)
        frac_near = (d < 0.4).mean()
        assert frac_near > 0.6, f"only {frac_near:.2f} of mesh verts near truth"

    def test_transcript_export(self, tracked_system, tmp_path):
        _, _, sysm = tracked_system
        p = tmp_path / "transcript.txt"
        sysm.carver.write_transcript(str(p))
        text = p.read_text()
        assert "new cam:" in text
        assert "new point:" in text

    def test_trajectory_export_tum(self, tracked_system, tmp_path):
        _, _, sysm = tracked_system
        p = tmp_path / "kf.txt"
        sysm.save_keyframe_trajectory_tum(str(p))
        from orb_slam_free_space_carving_tpu.utils.trajectory import load_trajectory_tum

        ts, pos, quat = load_trajectory_tum(str(p))
        assert len(ts) == int(sysm.map_host.kf_valid.sum())
        assert np.isfinite(pos).all()
