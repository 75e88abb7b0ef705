import os
import tempfile

import numpy as np

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig,
    SystemConfig,
    load_settings,
)
from orb_slam_free_space_carving_tpu.utils import synthetic, trajectory


def test_default_config():
    cfg = SystemConfig()
    assert cfg.orb.n_features == 1000
    assert cfg.optimizer.chi2_mono == 5.991
    assert cfg.matcher.th_low == 50
    assert cfg.mapping.covisibility_weight_min == 15


def test_yaml_loader_opencv_format(tmp_path):
    p = tmp_path / "settings.yaml"
    p.write_text(
        "%YAML:1.0\n\nCamera.fx: 700.0\nCamera.fy: 701.0\nCamera.cx: 320.0\n"
        "Camera.cy: 240.0\nCamera.fps: 20\nORBextractor.nFeatures: 2000\n"
        "ORBextractor.scaleFactor: 1.2\nORBextractor.nLevels: 8\n"
        "ORBextractor.iniThFAST: 20\nORBextractor.minThFAST: 7\n"
    )
    cfg = load_settings(str(p))
    assert cfg.camera.fx == 700.0
    assert cfg.orb.n_features == 2000
    assert cfg.orb.n_features_pad == 2048
    assert cfg.tracking.max_frames_between_kf == 20


def test_ate_zero_for_identical():
    x = np.random.default_rng(0).normal(size=(50, 3))
    assert trajectory.ate_rmse(x, x) < 1e-9


def test_ate_invariant_to_similarity():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(80, 3))
    # random similarity transform
    from scipy.spatial.transform import Rotation

    R = Rotation.random(random_state=2).as_matrix()
    y = 2.5 * (x @ R.T) + np.array([1.0, -2.0, 3.0])
    assert trajectory.ate_rmse(x, y, with_scale=True) < 1e-9


def test_trajectory_tum_roundtrip(tmp_path):
    import jax.numpy as jnp

    from orb_slam_free_space_carving_tpu.utils import lie

    rng = np.random.default_rng(3)
    xi = rng.normal(size=(10, 6)).astype(np.float32) * 0.3
    poses = lie.se3_exp(jnp.asarray(xi))
    ts = np.arange(10, dtype=np.float64)
    path = str(tmp_path / "traj.txt")
    trajectory.save_trajectory_tum(path, ts, poses)
    ts2, pos, quat = trajectory.load_trajectory_tum(path)
    twc = np.asarray(lie.se3_inverse(poses))
    np.testing.assert_allclose(pos, twc[:, 4:7], atol=1e-5)


def test_synthetic_renderer_images():
    cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=80.0, cy=60.0)
    seq = synthetic.SyntheticSequence(cam, n_frames=3)
    ts, im = seq.frame(0)
    assert im.shape == (120, 160) and im.dtype == np.uint8
    # textured scene should have real contrast
    assert im.std() > 20
    # consecutive frames differ but not wildly
    _, im1 = seq.frame(1)
    diff = np.abs(im.astype(int) - im1.astype(int)).mean()
    assert 0 < diff < 80


def test_synthetic_gt_consistency():
    cam = CameraConfig(width=160, height=120, fx=130.0, fy=130.0, cx=80.0, cy=60.0)
    seq = synthetic.SyntheticSequence(cam, n_frames=5)
    pos = seq.gt_positions()
    assert pos.shape == (5, 3)
    p7 = seq.gt_pose7(2)
    assert p7.shape == (7,)
    np.testing.assert_allclose(np.linalg.norm(p7[:4]), 1.0, atol=1e-5)
