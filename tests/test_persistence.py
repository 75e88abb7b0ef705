"""Map checkpoint/resume + textured mesh export tests.

Covers the auxiliary-subsystem capabilities from SURVEY.md section 5:
- event-journal transcript (tested in test_pipeline.py),
- map snapshot save/load with relocalization-based resume (the reference's
  acknowledged TODO, include/System.h:125-127),
- texture keyframes + textured OBJ/MTL/atlas export (TextureFrame +
  ModelDrawer textured draw + Modeler::GetTextures).
"""

import os

import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence


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
def run_result(tmp_path_factory):
    cfg = _cfg()
    seq = SyntheticSequence(cfg.camera, n_frames=30)
    sysm = System(cfg)
    for ts, img in seq:
        sysm.track_monocular(img, ts)
    sysm.shutdown()
    return cfg, seq, sysm


class TestMapCheckpoint:
    def test_save_load_roundtrip(self, run_result, tmp_path):
        cfg, seq, sysm = run_result
        path = str(tmp_path / "map.npz")
        sysm.save_map(path)
        assert os.path.exists(path)

        fresh = System(cfg)
        fresh.load_map(path)
        # Map contents identical.
        np.testing.assert_array_equal(
            np.asarray(fresh.map_arrays.pt_valid),
            np.asarray(sysm.map_arrays.pt_valid))
        np.testing.assert_allclose(
            np.asarray(fresh.map_arrays.kf_pose),
            np.asarray(sysm.map_arrays.kf_pose))
        assert fresh.map_host.n_kf_slots == sysm.map_host.n_kf_slots
        # Allocator consistent: no free slot is marked valid.
        free = set(fresh.map_host.pt_free)
        valid = set(np.where(fresh.map_host.pt_valid)[0].tolist())
        assert not (free & valid)

    def test_relocalize_in_loaded_map(self, run_result, tmp_path):
        """Localization-from-saved-map: a fresh engine loads the snapshot and
        relocalizes on a frame from the mapped sequence."""
        cfg, seq, sysm = run_result
        path = str(tmp_path / "map2.npz")
        sysm.save_map(path)

        fresh = System(cfg)
        fresh.load_map(path)
        fresh.activate_localization_mode()
        assert fresh.get_tracking_state() == trk.LOST
        ts, img = seq.frame(15)
        pose = fresh.track_monocular(img, ts)
        assert fresh.get_tracking_state() == trk.OK
        # Pose close to the ground truth (up to the original map's scale ~
        # handled because reloc uses the map's own scale; compare direction
        # to the original run's estimate at the same frame instead).
        orig = sysm.tracker.trajectory[15][1]
        import jax.numpy as jnp

        from orb_slam_free_space_carving_tpu.utils import lie

        c_new = np.asarray(lie.se3_inverse(jnp.asarray(pose)))[4:7]
        c_old = np.asarray(lie.se3_inverse(jnp.asarray(orig)))[4:7]
        assert np.linalg.norm(c_new - c_old) < 0.05


class TestTextures:
    def test_texture_queue_bounded(self, run_result):
        _, _, sysm = run_result
        assert sysm.carver is not None
        n = len(sysm.carver.textures)
        assert 1 <= n <= sysm.carver.max_textures
        # get_textures returns the most recent subset.
        assert len(sysm.carver.get_textures(3)) == min(3, n)

    def test_textured_obj_export(self, run_result, tmp_path):
        _, _, sysm = run_result
        path = str(tmp_path / "model.obj")
        sysm.save_textured_mesh_obj(path)
        text = open(path).read()
        assert "mtllib" in text and "vt " in text and "/" in text
        assert os.path.exists(str(tmp_path / "model.mtl"))
        # Atlas written if cv2 available.
        atlas = str(tmp_path / "model_atlas.png")
        if os.path.exists(atlas):
            import cv2

            im = cv2.imread(atlas, cv2.IMREAD_GRAYSCALE)
            assert im is not None and im.shape[0] > 0
