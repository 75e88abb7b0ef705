"""SO3 / SE3 / Sim3 Lie groups as batched JAX operations.

Replaces the reference's pose machinery spread across cv::Mat 4x4 matrices,
g2o ``SE3Quat`` (``Thirdparty/g2o/g2o/types/se3quat.h``) and g2o ``Sim3``
(``Thirdparty/g2o/g2o/types/sim3.h``) with one functional, vmappable module.

Conventions:
- Quaternions are Hamilton, scalar-first ``[w, x, y, z]``, unit norm.
- An SE3 pose is a length-7 vector ``[qw qx qy qz tx ty tz]`` mapping points
  from the source frame to the target frame: ``x_t = R x_s + t`` (for a camera
  pose ``Tcw``: world -> camera, as in the reference).
- A Sim3 is a length-8 vector ``[qw qx qy qz tx ty tz s]``: ``x_t = s R x_s + t``.
- Tangent vectors: se3 = ``[rho(3), phi(3)]`` (translation, rotation);
  sim3 = ``[rho(3), phi(3), sigma(1)]``.
- ``*_retract(pose, delta)`` applies a LEFT increment ``exp(delta) o pose``,
  matching the g2o vertex update convention used throughout the reference
  optimizer (``types_six_dof_expmap.h`` oplusImpl).

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quat_normalize(q):
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_multiply(a, b):
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_rotate(q, v):
    """Rotate vectors ``v[..., 3]`` by unit quaternions ``q[..., 4]``."""
    qw = q[..., :1]
    qv = q[..., 1:]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_matrix(R):
    """Shepperd's method, branchless via 4-way select (vmappable)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Four candidate constructions, each stable in its own region.
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([0.25 * s0, (m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0], -1)
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([(m21 - m12) / s1, 0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1], -1)
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2], -1)
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def hat(phi):
    """so3 hat operator: phi[...,3] -> skew[...,3,3]."""
    x, y, z = jnp.moveaxis(phi, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(m.shape[:-1] + (3, 3))


def so3_exp_quat(phi):
    """Axis-angle [...,3] -> unit quaternion, Taylor-safe near 0."""
    theta2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-8
    half = 0.5 * theta
    w = jnp.where(small, 1.0 - theta2 / 8.0, jnp.cos(half))
    k = jnp.where(small, 0.5 - theta2 / 48.0, jnp.sin(half) / theta)
    return quat_normalize(jnp.concatenate([w, k * phi], axis=-1))


def so3_log(q):
    """Unit quaternion -> axis-angle [...,3], Taylor-safe near identity."""
    q = jnp.where(q[..., :1] < 0, -q, q)  # shortest arc
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    vn = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    theta = 2.0 * jnp.arctan2(vn, w)
    small = vn < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), theta / jnp.maximum(vn, _EPS))
    return scale * q[..., 1:]


def _so3_left_jacobian(phi):
    """V = J_l(phi): integrates translation under rotation in se3 exp."""
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    small = theta2 < 1e-8
    a = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS))
    b = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS)
    )
    return eye + a * K + b * K2


def _so3_left_jacobian_inv(phi):
    theta2 = jnp.sum(phi * phi, axis=-1)[..., None, None]
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    small = theta2 < 1e-8
    half = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), _EPS)) / jnp.maximum(theta2, _EPS),
    )
    return eye - 0.5 * K + cot_term * K2


# ---------------------------------------------------------------------------
# SE3  (pose = [qw qx qy qz tx ty tz])
# ---------------------------------------------------------------------------

SE3_IDENTITY = jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=jnp.float32)


def se3_identity(batch_shape=()):
    return jnp.broadcast_to(SE3_IDENTITY, batch_shape + (7,))


def se3_from_Rt(R, t):
    return jnp.concatenate([quat_from_matrix(R), t], axis=-1)


def se3_to_Rt(pose):
    return quat_to_matrix(pose[..., :4]), pose[..., 4:7]


def se3_to_matrix(pose):
    R, t = se3_to_Rt(pose)
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0, 0, 1.0], dtype=pose.dtype), pose.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_apply(pose, x):
    """x[...,3] in source frame -> target frame."""
    return quat_rotate(pose[..., :4], x) + pose[..., 4:7]


def se3_compose(a, b):
    """(a o b)(x) = a(b(x))."""
    q = quat_multiply(a[..., :4], b[..., :4])
    t = quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    return jnp.concatenate([quat_normalize(q), t], axis=-1)


def se3_inverse(pose):
    qi = quat_conjugate(pose[..., :4])
    ti = -quat_rotate(qi, pose[..., 4:7])
    return jnp.concatenate([qi, ti], axis=-1)


def se3_exp(xi):
    """se3 tangent [rho(3), phi(3)] -> SE3 pose."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp_quat(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return jnp.concatenate([q, t], axis=-1)


def se3_log(pose):
    phi = so3_log(pose[..., :4])
    Vinv = _so3_left_jacobian_inv(phi)
    rho = jnp.einsum("...ij,...j->...i", Vinv, pose[..., 4:7])
    return jnp.concatenate([rho, phi], axis=-1)


def se3_retract(pose, xi):
    """Left-multiplicative update: exp(xi) o pose (g2o oplus convention)."""
    return se3_compose(se3_exp(xi), pose)


# ---------------------------------------------------------------------------
# Sim3  (sim = [qw qx qy qz tx ty tz s])
# ---------------------------------------------------------------------------

SIM3_IDENTITY = jnp.array([1.0, 0, 0, 0, 0, 0, 0, 1.0], dtype=jnp.float32)


def sim3_identity(batch_shape=()):
    return jnp.broadcast_to(SIM3_IDENTITY, batch_shape + (8,))


def sim3_from_Rts(R, t, s):
    return jnp.concatenate([quat_from_matrix(R), t, s[..., None]], axis=-1)


def sim3_apply(sim, x):
    return sim[..., 7:8] * quat_rotate(sim[..., :4], x) + sim[..., 4:7]


def sim3_compose(a, b):
    q = quat_multiply(a[..., :4], b[..., :4])
    t = a[..., 7:8] * quat_rotate(a[..., :4], b[..., 4:7]) + a[..., 4:7]
    s = a[..., 7:8] * b[..., 7:8]
    return jnp.concatenate([quat_normalize(q), t, s], axis=-1)


def sim3_inverse(sim):
    qi = quat_conjugate(sim[..., :4])
    si = 1.0 / jnp.maximum(sim[..., 7:8], _EPS)
    ti = -si * quat_rotate(qi, sim[..., 4:7])
    return jnp.concatenate([qi, ti, si], axis=-1)


def sim3_from_se3(pose, s=None):
    ones = jnp.ones(pose.shape[:-1] + (1,), dtype=pose.dtype)
    if s is not None:
        ones = ones * s
    return jnp.concatenate([pose, ones], axis=-1)


def sim3_to_se3(sim):
    """Drop scale into translation: x -> R x + t/s then rescale t (reference
    ``LoopClosing.cc:510-516`` converts corrected Sim3 back to SE3 by dividing
    translation by scale)."""
    s = jnp.maximum(sim[..., 7:8], _EPS)
    return jnp.concatenate([sim[..., :4], sim[..., 4:7] / s], axis=-1)


def sim3_exp(xi):
    """sim3 tangent [rho(3), phi(3), sigma] -> Sim3.

    Uses the closed-form W matrix (analogous to g2o ``sim3.h`` constructor).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    q = so3_exp_quat(phi)

    theta2 = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)

    sg = sigma
    small_s = jnp.abs(sg) < 1e-5
    small_t = theta2 < 1e-8
    es = jnp.exp(sg)

    # A = (e^s - 1)/s ; with rotation: standard Sim3 W-matrix coefficients.
    A = jnp.where(small_s, 1.0 + sg / 2.0 + sg * sg / 6.0, (es - 1.0) / jnp.where(small_s, 1.0, sg))
    denom = sg * sg + theta2
    denom = jnp.maximum(denom, _EPS)
    B = jnp.where(
        small_s & small_t,
        0.5,
        (es * jnp.sin(theta) * sg + (1.0 - es * jnp.cos(theta)) * theta)
        / jnp.maximum(theta * denom, _EPS),
    )
    C = jnp.where(
        small_s & small_t,
        1.0 / 6.0,
        (A - ((es * jnp.cos(theta) - 1.0) * sg + es * jnp.sin(theta) * theta) / jnp.maximum(denom, _EPS))
        / jnp.maximum(theta2, _EPS),
    )
    W = A[..., None, None] * eye + B[..., None, None] * K + C[..., None, None] * K2
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return jnp.concatenate([q, t, s[..., None]], axis=-1)


def sim3_retract(sim, xi):
    return sim3_compose(sim3_exp(xi), sim)


def sim3_log(sim):
    """Inverse of sim3_exp (iterative-free closed form via W solve)."""
    phi = so3_log(sim[..., :4])
    sigma = jnp.log(jnp.maximum(sim[..., 7], _EPS))
    # Recover W from (phi, sigma) and solve W rho = t.
    xi_probe = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], axis=-1)
    # Build W by differentiating: reuse sim3_exp pieces via linear solves on basis.
    basis = jnp.eye(3, dtype=sim.dtype)
    cols = [
        sim3_exp(jnp.concatenate(
            [jnp.broadcast_to(basis[i], phi.shape), phi, sigma[..., None]], axis=-1
        ))[..., 4:7]
        for i in range(3)
    ]
    W = jnp.stack(cols, axis=-1)
    rho = jnp.linalg.solve(W, sim[..., 4:7][..., None])[..., 0]
    del xi_probe
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Numpy mirrors for host-side bookkeeping (the mapping worker computes small
# pose quantities on host to avoid data-dependent-shape device dispatches —
# every distinct shape is a fresh XLA compile through the TPU tunnel).
# ---------------------------------------------------------------------------

def np_quat_rotate(q: "np.ndarray", v: "np.ndarray") -> "np.ndarray":
    """Rotate v[...,3] by unit quaternion(s) q[...,4] (w,x,y,z), numpy."""
    import numpy as np

    w, xyz = q[..., :1], q[..., 1:4]
    t = 2.0 * np.cross(xyz, v)
    return v + w * t + np.cross(xyz, t)


def np_se3_apply(pose: "np.ndarray", x: "np.ndarray") -> "np.ndarray":
    """x_c = R x + t for pose7 [..., 7] (q wxyz | t), numpy."""
    return np_quat_rotate(pose[..., :4], x) + pose[..., 4:7]


def np_se3_inverse(pose: "np.ndarray") -> "np.ndarray":
    """pose7 inverse, numpy: (q, t) -> (q*, -R^T t)."""
    import numpy as np

    q = pose[..., :4]
    qc = np.concatenate([q[..., :1], -q[..., 1:4]], axis=-1)
    t_inv = -np_quat_rotate(qc, pose[..., 4:7])
    return np.concatenate([qc, t_inv], axis=-1)
