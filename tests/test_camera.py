import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import CameraConfig
from orb_slam_free_space_carving_tpu.utils import camera, lie


CAM = CameraConfig(k1=0.26, k2=-0.95, p1=-0.0054, p2=0.0026, k3=1.16)  # TUM1-like


def test_project_unproject_roundtrip(rng):
    intr = camera.intrinsics_array(CAM)
    uv = jnp.asarray(rng.uniform([50, 50], [590, 430], size=(128, 2)).astype(np.float32))
    depth = jnp.asarray(rng.uniform(0.5, 5.0, size=(128,)).astype(np.float32))
    xc = camera.unproject(uv, depth, intr)
    uv2 = camera.project(xc, intr)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)


def test_distort_undistort_roundtrip(rng):
    intr = camera.intrinsics_array(CAM)
    xn = jnp.asarray(rng.uniform(-0.3, 0.3, size=(256, 2)).astype(np.float32))
    xd = camera.distort_normalized(xn, intr)
    xn2 = camera.undistort_normalized(xd, intr, iterations=12)
    np.testing.assert_allclose(np.asarray(xn2), np.asarray(xn), atol=1e-4)


def test_undistort_matches_opencv(rng):
    import cv2

    intr = camera.intrinsics_array(CAM)
    uv = rng.uniform([100, 100], [540, 380], size=(64, 2)).astype(np.float32)
    ours = np.asarray(camera.undistort_pixels(jnp.asarray(uv), intr, iterations=20))
    cv = cv2.undistortPoints(
        uv.reshape(-1, 1, 2), CAM.K, CAM.dist_coeffs, P=CAM.K
    ).reshape(-1, 2)
    np.testing.assert_allclose(ours, cv, atol=0.1)


def test_in_frustum():
    intr = camera.intrinsics_array(CAM)
    pose = lie.se3_identity()
    pts = jnp.asarray(
        [[0.0, 0.0, 2.0], [0.0, 0.0, -1.0], [50.0, 0.0, 2.0]], jnp.float32
    )
    ok, uv, z, dist, vcos = camera.in_frustum(pose, None, None, None, None) if False else camera.in_frustum(
        pts, pose, intr, CAM.width, CAM.height
    )
    assert bool(ok[0]) and not bool(ok[1]) and not bool(ok[2])
    np.testing.assert_allclose(np.asarray(uv[0]), [CAM.cx, CAM.cy], atol=1e-3)


def test_predict_scale_level():
    lv = camera.predict_scale_level(
        jnp.asarray([1.0, 2.0]), jnp.asarray([2.0, 2.0]), 1.2, 8
    )
    assert int(lv[0]) == 4  # log(2)/log(1.2) ~ 3.8 -> ceil 4
    assert int(lv[1]) == 0
