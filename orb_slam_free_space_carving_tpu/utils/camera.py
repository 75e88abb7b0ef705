"""Batched pinhole camera model with radial-tangential distortion.

Replaces the reference's scattered OpenCV camera math:
``cv::undistortPoints`` keypoint undistortion (``src/Frame.cc:404-434``),
manual projection in ``Frame::isInFrustum`` (``src/Frame.cc:269-325``) and the
per-point projections in the matchers/optimizer.  Everything is jittable and
broadcasts over leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.config import CameraConfig


def intrinsics_array(cam: CameraConfig):
    """Pack intrinsics as a device vector [fx fy cx cy k1 k2 p1 p2 k3]."""
    return jnp.array(
        [cam.fx, cam.fy, cam.cx, cam.cy, cam.k1, cam.k2, cam.p1, cam.p2, cam.k3],
        dtype=jnp.float32,
    )


def distort_normalized(xn, intr):
    """Apply radtan distortion to normalized coords xn[...,2]."""
    k1, k2, p1, p2, k3 = intr[4], intr[5], intr[6], intr[7], intr[8]
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xd, intr, iterations: int = 8):
    """Invert radtan distortion by fixed-point iteration (jit-friendly,
    static iteration count replaces cv::undistortPoints' loop)."""

    def body(_, xn):
        k1, k2, p1, p2, k3 = intr[4], intr[5], intr[6], intr[7], intr[8]
        x, y = xn[..., 0], xn[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xy = x * y
        dx = 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
        xn_new = jnp.stack(
            [(xd[..., 0] - dx) / radial, (xd[..., 1] - dy) / radial], axis=-1
        )
        return xn_new

    return jax.lax.fori_loop(0, iterations, body, xd)


def pixel_to_normalized(uv, intr):
    return jnp.stack(
        [(uv[..., 0] - intr[2]) / intr[0], (uv[..., 1] - intr[3]) / intr[1]], axis=-1
    )


def normalized_to_pixel(xn, intr):
    return jnp.stack(
        [xn[..., 0] * intr[0] + intr[2], xn[..., 1] * intr[1] + intr[3]], axis=-1
    )


def undistort_pixels(uv, intr, iterations: int = 8):
    """Distorted pixel coords -> undistorted pixel coords (Frame.cc:404-434)."""
    xn = undistort_normalized(pixel_to_normalized(uv, intr), intr, iterations)
    return normalized_to_pixel(xn, intr)


def project(xc, intr, distort: bool = False):
    """Camera-frame points xc[...,3] -> pixel uv[...,2]. Caller checks z>0."""
    z = xc[..., 2:3]
    xn = xc[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    if distort:
        xn = distort_normalized(xn, intr)
    return normalized_to_pixel(xn, intr)


def unproject(uv, depth, intr):
    """Undistorted pixels + depth -> camera-frame 3D (Frame::UnprojectStereo)."""
    xn = pixel_to_normalized(uv, intr)
    d = depth[..., None]
    return jnp.concatenate([xn * d, d], axis=-1)


def in_image(uv, width, height, border: float = 0.0):
    return (
        (uv[..., 0] >= border)
        & (uv[..., 0] < width - border)
        & (uv[..., 1] >= border)
        & (uv[..., 1] < height - border)
    )


def in_frustum(points_w, pose_cw, intr, width, height,
               min_dist=None, max_dist=None, normals_w=None,
               view_cos_limit: float = 0.5):
    """Batched Frame::isInFrustum (reference ``src/Frame.cc:269-325``).

    Returns (visible_mask, uv, depth, dist, view_cos).  ``min/max_dist`` are the
    per-point scale-invariance bounds; ``normals_w`` the mean viewing normals.
    """
    from orb_slam_free_space_carving_tpu.utils import lie

    xc = lie.se3_apply(pose_cw, points_w)
    z = xc[..., 2]
    uv = project(xc, intr)
    ok = (z > 0) & in_image(uv, width, height)

    cam_center = lie.se3_inverse(pose_cw)[..., 4:7]
    po = points_w - cam_center
    dist = jnp.linalg.norm(po, axis=-1)
    if min_dist is not None:
        ok = ok & (dist >= 0.8 * min_dist) & (dist <= 1.2 * max_dist)
    view_cos = jnp.ones_like(dist)
    if normals_w is not None:
        view_cos = jnp.sum(po * normals_w, axis=-1) / jnp.maximum(dist, 1e-9)
        ok = ok & (view_cos >= view_cos_limit)
    return ok, uv, z, dist, view_cos


def predict_scale_level(dist, max_dist, scale_factor: float, n_levels: int):
    """MapPoint::PredictScale (reference ``src/MapPoint.cc:394-425``)."""
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(scale_factor))
    return jnp.clip(level.astype(jnp.int32), 0, n_levels - 1)
