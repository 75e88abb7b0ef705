"""Motion-only pose optimization (Gauss-Newton with Huber IRLS).

TPU replacement for ``Optimizer::PoseOptimization`` (reference
``src/Optimizer.cc:239-451``), which builds a g2o graph with one SE3 vertex and
unary reprojection edges, then runs 4 rounds of 10 LM iterations, relabelling
chi2 outliers between rounds.  Here the normal equations are formed directly:
analytic [2,6] Jacobians per observation (same math as g2o
``types_six_dof_expmap.h`` linearizeOplus), one batched reduction to the 6x6
system, a 6-dim solve, and a left-multiplicative SE3 retraction — all inside
``lax.fori_loop`` with static iteration counts.  The outlier relabelling
between rounds (``Optimizer.cc:390-440``) is a mask update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.utils import camera, lie


class PoseOptResult(NamedTuple):
    pose: jnp.ndarray       # [7] refined Tcw
    inliers: jnp.ndarray    # [N] bool (post chi2 gating)
    n_inliers: jnp.ndarray  # scalar int
    chi2: jnp.ndarray       # [N] final per-obs chi2


def _residual_jacobian(pose_cw, points_w, uv_obs, intr):
    """Per-observation reprojection error e = uv_pred - uv_obs and its [2,6]
    Jacobian w.r.t. a left increment xi = [rho, phi] on Tcw.

    d xc / d xi = [ I | -hat(xc) ];  d uv / d xc = [[fx/z, 0, -fx x/z^2],
                                                    [0, fy/z, -fy y/z^2]].
    """
    xc = lie.se3_apply(pose_cw, points_w)        # [N,3]
    x, y = xc[..., 0], xc[..., 1]
    z = jnp.maximum(xc[..., 2], 1e-6)
    fx, fy = intr[0], intr[1]
    uv = camera.project(xc, intr)
    e = uv - uv_obs                               # [N,2]

    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    # d uv / d xc : [N,2,3]
    duv = jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )
    # d xc / d xi : [N,3,6] = [I | -hat(xc)]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), xc.shape[:-1] + (3, 3))
    dxc = jnp.concatenate([eye, -lie.hat(xc)], axis=-1)
    J = duv @ dxc                                 # [N,2,6]
    return e, J, xc[..., 2]


def _residual_jacobian_stereo(pose_cw, points_w, uv_obs, ur_obs, ur_mask,
                              intr, bf):
    """3-row stereo residual e = [u-u*, v-v*, uR-uR*] and [3,6] Jacobian.

    Same math as g2o ``EdgeStereoSE3ProjectXYZOnlyPose`` (the reference's
    stereo pose edges, ``Optimizer.cc:326-356``): uR = u - bf/z, so the third
    Jacobian row is the u-row plus (bf/z^2) * dz/dxi.  Rows without a stereo
    measurement (``ur_mask`` false) get a zeroed third row — one static-shape
    program covers mixed mono/stereo observation sets.
    """
    e2, J2, z = _residual_jacobian(pose_cw, points_w, uv_obs, intr)
    xc = lie.se3_apply(pose_cw, points_w)
    zc = jnp.maximum(xc[..., 2], 1e-6)
    uv = camera.project(xc, intr)
    ur_pred = uv[..., 0] - bf / zc
    e_ur = (ur_pred - ur_obs) * ur_mask.astype(e2.dtype)
    # d uR / d xc = d u / d xc + [0, 0, bf/z^2]; chain through dxc/dxi.
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), xc.shape[:-1] + (3, 3))
    dxc = jnp.concatenate([eye, -lie.hat(xc)], axis=-1)        # [N,3,6]
    dz = dxc[..., 2, :]                                        # [N,6]
    J_ur = J2[..., 0, :] + (bf / (zc * zc))[..., None] * dz
    J_ur = J_ur * ur_mask[..., None].astype(J2.dtype)
    e = jnp.concatenate([e2, e_ur[..., None]], axis=-1)        # [N,3]
    J = jnp.concatenate([J2, J_ur[..., None, :]], axis=-2)     # [N,3,6]
    return e, J, z


def _huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel with squared delta ``delta2``."""
    return jnp.where(chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12)))


def _gn_rounds(pose0, points_w, uv_obs, inv_sigma2, mask0, intr,
               chi2_th, rounds, iterations, robust_last_round,
               ur_obs=None, bf: float = 0.0, chi2_th_stereo: float = 7.815):
    mask = mask0
    pose = pose0
    if ur_obs is not None:
        ur_mask = ur_obs >= 0
        chi2_th = jnp.where(ur_mask, chi2_th_stereo, chi2_th)

    def resid(p):
        if ur_obs is None:
            return _residual_jacobian(p, points_w, uv_obs, intr)
        return _residual_jacobian_stereo(
            p, points_w, uv_obs, ur_obs, ur_mask, intr, bf
        )

    for r in range(rounds):
        use_huber = robust_last_round or (r < rounds - 1)

        def gn_step(_, p):
            e, J, _z = resid(p)
            chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
            w = inv_sigma2 * mask.astype(e.dtype)
            if use_huber:
                w = w * _huber_weight(chi2, chi2_th)
            # H = sum w J^T J ; b = sum w J^T e  -> solve H dx = -b
            JW = J * w[:, None, None]
            H = jnp.einsum("nij,nik->jk", JW, J)
            b = jnp.einsum("nij,ni->j", JW, e)
            H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
            dx = -jnp.linalg.solve(H, b)
            # Degenerate systems (all points near the camera plane, singular
            # H from inf Jacobians) must not poison the pose with NaNs: a
            # non-finite step is a no-op.
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            return lie.se3_retract(p, dx)

        pose = jax.lax.fori_loop(0, iterations, gn_step, pose)
        # Outlier relabelling between rounds (Optimizer.cc:390-440): points with
        # chi2 above threshold (or behind camera) are excluded from later rounds
        # but re-tested each time against the refined pose.
        e, _, z = resid(pose)
        chi2 = jnp.sum(e * e, axis=-1) * inv_sigma2
        mask = mask0 & (chi2 <= chi2_th) & (z > 0)
    # A non-finite pose (NaN input, catastrophic divergence) reverts to the
    # initial guess with every observation relabelled outlier — the caller's
    # low-inlier handling (re-track / relocalize) takes over, exactly like a
    # failed PoseOptimization in the reference.
    bad = ~jnp.all(jnp.isfinite(pose))
    pose = jnp.where(bad, pose0, pose)
    mask = mask & ~bad & jnp.isfinite(chi2)
    return pose, mask, chi2


def optimize_pose(
    pose0: jnp.ndarray,         # [7] initial Tcw
    points_w: jnp.ndarray,      # [N,3] matched map points (world)
    uv_obs: jnp.ndarray,        # [N,2] undistorted observations
    inv_sigma2: jnp.ndarray,    # [N] per-obs information (1/sigma^2 by octave)
    mask: jnp.ndarray,          # [N] valid-match mask
    intr: jnp.ndarray,
    chi2_th: float = 5.991,
    rounds: int = 4,
    iterations: int = 10,
    ur_obs: jnp.ndarray | None = None,
    bf: float = 0.0,
    chi2_th_stereo: float = 7.815,
) -> PoseOptResult:
    """4x10 motion-only GN with inter-round chi2 relabelling.

    Matches the iteration budget & thresholds of ``Optimizer::PoseOptimization``
    (``src/Optimizer.cc:369-371``: its4=[10,10,10,10], chi2Mono=5.991; the
    final round drops the robust kernel like g2o setRobustKernel(0) at :427).
    With ``ur_obs`` (right x coords, -1 = mono) the residual gains the stereo
    row with chi2Stereo=7.815 per-obs thresholds (``Optimizer.cc:372-373``).
    """
    pose, inliers, chi2 = _gn_rounds(
        pose0, points_w, uv_obs, inv_sigma2, mask, intr,
        chi2_th=chi2_th, rounds=rounds, iterations=iterations,
        robust_last_round=False,
        ur_obs=ur_obs, bf=bf, chi2_th_stereo=chi2_th_stereo,
    )
    return PoseOptResult(
        pose=pose, inliers=inliers, n_inliers=jnp.sum(inliers), chi2=chi2
    )
