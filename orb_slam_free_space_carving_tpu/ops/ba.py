"""Bundle adjustment: Schur-complement Levenberg-Marquardt in pure JAX.

TPU replacement for the entire g2o stack used by the reference
(``src/Optimizer.cc:41-237`` BundleAdjustment, ``:453-791``
LocalBundleAdjustment; g2o ``BlockSolver_6_3`` with point marginalization,
``optimization_algorithm_levenberg.cpp``).  The design follows SURVEY.md
section 7: block-sparse normal equations

    [ U   W ] [dx_c]   [b_c]
    [ W^T V ] [dx_p] = [b_p]

with U = block-diag over cameras (6x6), V = block-diag over points (3x3,
embarrassingly parallel inverse), W assembled *dense* ([6C, 3P]) because local
windows are small (C<=32, P<=8192 -> 14 MB), so the reduced camera system

    S = U - W V^-1 W^T        (Schur complement, one big MXU matmul)

is a tiny dense SPD solve.  Observations are fixed-capacity COO arrays
(cam_idx, pt_idx, uv, inv_sigma2, mask) — the BA window's dynamic size becomes
masks (SURVEY.md hard part 2).  The LM damping/accept-reject loop runs under
``lax.fori_loop`` with a static iteration budget (the reference's abortable BA
becomes a bounded budget).

A matrix-free CG variant for global-BA-scale problems lives in
:func:`ba_solve_cg` — same Jacobians, Schur product applied obs-wise, suitable
for keyframe-sharded execution with ``psum`` (see parallel/).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.utils import camera, lie


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem. C cameras, P points, O observations.

    ``obs_ur`` (optional): right x coordinate per observation (-1 = mono).
    When present the residual gains the stereo row uR = u - bf/z like the
    reference's EdgeStereoSE3ProjectXYZ (``Optimizer.cc:158-186``), with
    ``bf`` supplied to the solver.
    """

    cam_poses: jnp.ndarray    # [C,7] Tcw
    cam_free: jnp.ndarray     # [C] bool — optimized vs fixed anchors
    points: jnp.ndarray       # [P,3] world
    point_valid: jnp.ndarray  # [P] bool
    obs_cam: jnp.ndarray      # [O] int32
    obs_point: jnp.ndarray    # [O] int32
    obs_uv: jnp.ndarray       # [O,2] undistorted pixels
    obs_inv_sigma2: jnp.ndarray  # [O]
    obs_mask: jnp.ndarray     # [O] bool
    obs_ur: Optional[jnp.ndarray] = None  # [O] right x or -1 (None = all mono)


class BAResult(NamedTuple):
    cam_poses: jnp.ndarray
    points: jnp.ndarray
    obs_chi2: jnp.ndarray     # [O] final per-obs chi2 (for outlier erasure)
    cost: jnp.ndarray         # scalar final robust cost


def _duv_dxc(xc, intr):
    x, y = xc[..., 0], xc[..., 1]
    z = jnp.maximum(xc[..., 2], 1e-6)
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    fx, fy = intr[0], intr[1]
    return jnp.stack(
        [
            jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1),
            jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1),
        ],
        axis=-2,
    )  # [...,2,3]


def _obs_residual(prob: BAProblem, cam_poses, points, intr, bf):
    """Residual rows per observation: [O,2] mono or [O,3] with the stereo row
    (uR = u - bf/z) zeroed where there is no right-x measurement."""
    pose_o = cam_poses[prob.obs_cam]
    pt_o = points[prob.obs_point]
    xc = lie.se3_apply(pose_o, pt_o)
    uv = camera.project(xc, intr)
    e = uv - prob.obs_uv                                     # [O,2]
    if prob.obs_ur is not None:
        z = jnp.maximum(xc[..., 2], 1e-6)
        ur_mask = prob.obs_ur >= 0
        e_ur = (uv[..., 0] - bf / z - prob.obs_ur) * ur_mask.astype(e.dtype)
        e = jnp.concatenate([e, e_ur[..., None]], axis=-1)   # [O,3]
    return e, xc


def _linearize(prob: BAProblem, cam_poses, points, intr, chi2_th, robust,
               bf: float = 0.0):
    """Per-observation linearization shared by dense and CG paths."""
    pose_o = cam_poses[prob.obs_cam]
    pt_o = points[prob.obs_point]
    R_o = lie.quat_to_matrix(pose_o[..., :4])
    xc = lie.se3_apply(pose_o, pt_o)
    uv = camera.project(xc, intr)
    e = uv - prob.obs_uv                                     # [O,2]
    duv = _duv_dxc(xc, intr)                                 # [O,2,3]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xc.dtype), xc.shape[:-1] + (3, 3))
    dxc_dxi = jnp.concatenate([eye, -lie.hat(xc)], axis=-1)   # [O,3,6]
    Jc = duv @ dxc_dxi                                        # [O,2,6]
    Jp = duv @ R_o                                            # [O,2,3]

    if prob.obs_ur is not None:
        # Stereo row: d uR/d xc = d u/d xc + [0,0,bf/z^2] (g2o stereo edge).
        z = jnp.maximum(xc[..., 2], 1e-6)
        ur_mask = (prob.obs_ur >= 0).astype(e.dtype)
        e_ur = (uv[..., 0] - bf / z - prob.obs_ur) * ur_mask
        dur_dxc = duv[..., 0, :] + (bf / (z * z))[..., None] * jnp.asarray(
            [0.0, 0.0, 1.0], e.dtype
        )
        Jc_ur = jnp.einsum("oi,oik->ok", dur_dxc, dxc_dxi) * ur_mask[..., None]
        Jp_ur = jnp.einsum("oi,oik->ok", dur_dxc, R_o) * ur_mask[..., None]
        e = jnp.concatenate([e, e_ur[..., None]], axis=-1)
        Jc = jnp.concatenate([Jc, Jc_ur[..., None, :]], axis=-2)  # [O,3,6]
        Jp = jnp.concatenate([Jp, Jp_ur[..., None, :]], axis=-2)  # [O,3,3]

    valid = (
        prob.obs_mask
        & prob.point_valid[prob.obs_point]
        & (xc[..., 2] > 1e-6)
    )
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2
    # Invalid rows must be HARD-ZEROED, not weight-zeroed: a non-finite
    # residual/Jacobian (behind-camera blowup) times w=0 is NaN, and one NaN
    # row poisons every segment_sum block it touches.
    valid = valid & jnp.isfinite(chi2)
    e = jnp.where(valid[..., None], e, 0.0)
    Jc = jnp.where(valid[..., None, None], Jc, 0.0)
    Jp = jnp.where(valid[..., None, None], Jp, 0.0)
    w = prob.obs_inv_sigma2 * valid.astype(e.dtype)
    if robust:
        w = w * jnp.where(
            chi2 <= chi2_th, 1.0, jnp.sqrt(chi2_th / jnp.maximum(chi2, 1e-12))
        )
    # Zero camera Jacobian for fixed cameras (anchors, Optimizer.cc:497-504).
    Jc = Jc * prob.cam_free[prob.obs_cam, None, None].astype(Jc.dtype)
    return e, Jc, Jp, w, chi2, valid


def _robust_cost(prob, cam_poses, points, intr, chi2_th, bf: float = 0.0):
    e, xc = _obs_residual(prob, cam_poses, points, intr, bf)
    valid = prob.obs_mask & prob.point_valid[prob.obs_point]
    geom_ok = xc[..., 2] > 1e-6
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2
    # Huber rho
    rho = jnp.where(
        chi2 <= chi2_th, chi2, 2.0 * jnp.sqrt(chi2_th * jnp.maximum(chi2, 0.0)) - chi2_th
    )
    # Behind-camera (or numerically exploded) observations are heavily
    # penalized, NOT dropped: dropping them lets the LM accept test score a
    # degenerate "everything behind the cameras" state as zero cost and accept
    # a divergent step.  The penalty must dominate any realistic per-obs chi2
    # (a large post-loop map carries ~500k total cost over ~15k obs, i.e.
    # chi2 ~ 35/obs; the old 8*chi2_th ~ 48 made flipping points behind the
    # cameras CHEAPER than keeping them — an accepted divergence).
    geom_ok = geom_ok & jnp.isfinite(rho)
    rho = jnp.where(geom_ok, rho, 1e4 * chi2_th)
    return jnp.sum(jnp.where(valid, rho, 0.0))


def _inv3x3(M):
    """Batched closed-form 3x3 inverse via adjugate (fast, vmap-free)."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def ba_solve(
    prob: BAProblem,
    intr: jnp.ndarray,
    iterations: int = 10,
    chi2_th: float = 5.991,
    robust: bool = True,
    lm_lambda0: float = 1e-4,
    lm_lambda_factor: float = 2.0,
    bf: float = 0.0,
    chi2_th_stereo: float = 7.815,
) -> BAResult:
    """Dense-Schur LM bundle adjustment with static shapes.

    One LM iteration = linearize -> assemble (U, V, W, b) by ``segment_sum`` ->
    Schur-reduce with two MXU matmuls -> Cholesky-solve the reduced camera
    system -> back-substitute points -> accept/reject with damping update
    (g2o Levenberg ni-strategy simplified to x2 / x0.5).
    """
    C = prob.cam_poses.shape[0]
    P = prob.points.shape[0]
    if prob.obs_ur is not None:
        chi2_th = jnp.where(prob.obs_ur >= 0, chi2_th_stereo, chi2_th)

    def lm_iter(_, carry):
        cam_poses, points, lam, cost = carry
        e, Jc, Jp, w, _, _ = _linearize(
            prob, cam_poses, points, intr, chi2_th, robust, bf
        )
        wJc = Jc * w[:, None, None]
        wJp = Jp * w[:, None, None]

        # Block assembly via segment sums over observations.
        Ublk = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", wJc, Jc), prob.obs_cam, num_segments=C
        )  # [C,6,6]
        Vblk = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", wJp, Jp), prob.obs_point, num_segments=P
        )  # [P,3,3]
        bc = -jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", wJc, e), prob.obs_cam, num_segments=C
        )  # [C,6]
        bp = -jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", wJp, e), prob.obs_point, num_segments=P
        )  # [P,3]
        Wblk = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", wJc, Jp),
            prob.obs_cam * P + prob.obs_point,
            num_segments=C * P,
        ).reshape(C, P, 6, 3)

        # LM damping (additive lambda on the block diagonals).
        Vinv = _inv3x3(Vblk + lam * jnp.eye(3))  # [P,3,3]

        # Dense W [6C, 3P] and Y = W V^-1.
        Wd = Wblk.transpose(0, 2, 1, 3).reshape(C * 6, P, 3)
        Y = jnp.einsum("kpj,pji->kpi", Wd, Vinv)              # [6C,P,3]
        S_red = jnp.einsum("kpi,lpi->kl", Y, Wd)              # [6C,6C]
        Ud = jnp.zeros((C, 6, C, 6)).at[jnp.arange(C), :, jnp.arange(C), :].set(
            Ublk + lam * jnp.eye(6)
        ).reshape(C * 6, C * 6)
        S = Ud - S_red
        rhs = bc.reshape(-1) - jnp.einsum("kpi,pi->k", Y, bp)

        # Fixed / unused cameras: identity rows so the solve stays SPD.
        free6 = jnp.repeat(prob.cam_free, 6)
        S = jnp.where(
            free6[:, None] & free6[None, :], S,
            jnp.eye(C * 6) * 1.0,
        )
        rhs = jnp.where(free6, rhs, 0.0)
        dxc = jnp.linalg.solve(S, rhs).reshape(C, 6)

        # Back-substitute: dx_p = V^-1 (b_p - W^T dx_c).
        WTdx = jnp.einsum("kpi,k->pi", Wd, dxc.reshape(-1))
        dxp = jnp.einsum("pij,pj->pi", Vinv, bp - WTdx)
        dxp = dxp * prob.point_valid[:, None]

        new_poses = jax.vmap(lie.se3_retract)(
            cam_poses, dxc * prob.cam_free[:, None]
        )
        new_points = points + dxp

        new_cost = _robust_cost(prob, new_poses, new_points, intr, chi2_th, bf)
        # A step is only acceptable if it lowers the cost AND stays finite:
        # the behind-camera penalty keeps the COST finite even when a pose
        # has gone NaN, so the finiteness of the state must be checked
        # explicitly or a poisoned step slips through the accept test.
        accept = (new_cost < cost) \
            & jnp.all(jnp.isfinite(new_poses)) \
            & jnp.all(jnp.isfinite(new_points))
        cam_poses = jnp.where(accept, new_poses, cam_poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.where(accept, lam / lm_lambda_factor,
                        lam * lm_lambda_factor * lm_lambda_factor)
        lam = jnp.clip(lam, 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return cam_poses, points, lam, cost

    cost0 = _robust_cost(prob, prob.cam_poses, prob.points, intr, chi2_th, bf)
    cam_poses, points, _, cost = jax.lax.fori_loop(
        0, iterations, lm_iter,
        (prob.cam_poses, prob.points, jnp.float32(lm_lambda0), cost0),
    )

    # Final chi2 for outlier erasure by the caller (Optimizer.cc:711-757).
    e, xc = _obs_residual(prob, cam_poses, points, intr, bf)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2
    chi2 = jnp.where(xc[..., 2] > 0, chi2, jnp.inf)
    return BAResult(cam_poses=cam_poses, points=points, obs_chi2=chi2, cost=cost)


# ---------------------------------------------------------------------------
# Matrix-free CG variant (global-BA scale; shardable over observations)
# ---------------------------------------------------------------------------

def _schur_matvec_obs(x, Ublk, Vinv, wJc, Jp, obs_cam, obs_point, lam, C, P):
    """S x = (U + lam I) x - W V^-1 W^T x, matrix-free over observations.

    W[c,p] = sum_o Jc[o]^T w[o] Jp[o] is never materialized (it is [C,P,6,3]
    dense — 300 MB at global-BA capacity); instead each application is two
    per-observation einsum + segment_sum passes, O(O) work and memory.  This
    is also the form that shards over observations (parallel/sharded.py): the
    segment sums become one all-reduce each under GSPMD.
    """
    xb = x.reshape(C, 6)
    Ux = jnp.einsum("cij,cj->ci", Ublk, xb).reshape(-1) + lam * x
    # W^T x: per-obs Jp^T (w Jc x_cam) -> segment-sum by point.
    Jcx = jnp.einsum("ori,oi->or", wJc, xb[obs_cam])           # [O,r]
    WTx = jax.ops.segment_sum(
        jnp.einsum("orj,or->oj", Jp, Jcx), obs_point, num_segments=P
    )                                                          # [P,3]
    y = jnp.einsum("pij,pj->pi", Vinv, WTx)                    # [P,3]
    # W y: per-obs wJc^T (Jp y_point) -> segment-sum by camera.
    Jpy = jnp.einsum("orj,oj->or", Jp, y[obs_point])           # [O,r]
    Wy = jax.ops.segment_sum(
        jnp.einsum("ori,or->oi", wJc, Jpy), obs_cam, num_segments=C
    )                                                          # [C,6]
    return Ux - Wy.reshape(-1)


def ba_solve_cg(
    prob: BAProblem,
    intr: jnp.ndarray,
    iterations: int = 10,
    cg_iterations: int = 30,
    chi2_th: float = 5.991,
    robust: bool = True,
    lm_lambda0: float = 1e-4,
    lm_lambda_factor: float = 2.0,
    bf: float = 0.0,
    chi2_th_stereo: float = 7.815,
) -> BAResult:
    """Same LM outer loop, but the reduced camera system is solved with
    preconditioned conjugate gradients instead of a dense factorization.

    The Schur product is applied matrix-free (one einsum chain per CG step), so
    memory stays O(C + P + O) — this is the form that scales to global BA and
    shards over keyframes/observations with a ``psum`` on the reduced products
    (SURVEY.md section 2.4 "New" row; wired up in parallel/sharded_ba.py).
    """
    C = prob.cam_poses.shape[0]
    P = prob.points.shape[0]
    if prob.obs_ur is not None:
        chi2_th = jnp.where(prob.obs_ur >= 0, chi2_th_stereo, chi2_th)

    def lm_iter(_, carry):
        cam_poses, points, lam, cost = carry
        e, Jc, Jp, w, _, _ = _linearize(
            prob, cam_poses, points, intr, chi2_th, robust, bf
        )
        wJc = Jc * w[:, None, None]
        wJp = Jp * w[:, None, None]
        Ublk = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", wJc, Jc), prob.obs_cam, num_segments=C
        )
        Vblk = jax.ops.segment_sum(
            jnp.einsum("oij,oik->ojk", wJp, Jp), prob.obs_point, num_segments=P
        )
        bc = -jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", wJc, e), prob.obs_cam, num_segments=C
        )
        bp = -jax.ops.segment_sum(
            jnp.einsum("oij,oi->oj", wJp, e), prob.obs_point, num_segments=P
        )
        Vinv = _inv3x3(Vblk + lam * jnp.eye(3))
        # rhs = bc - W V^-1 bp, matrix-free (see _schur_matvec_obs).
        y0 = jnp.einsum("pij,pj->pi", Vinv, bp)
        Jpy0 = jnp.einsum("orj,oj->or", Jp, y0[prob.obs_point])
        Wy0 = jax.ops.segment_sum(
            jnp.einsum("ori,or->oi", wJc, Jpy0), prob.obs_cam, num_segments=C
        )
        rhs = bc.reshape(-1) - Wy0.reshape(-1)
        free6 = jnp.repeat(prob.cam_free, 6)
        rhs = jnp.where(free6, rhs, 0.0)

        # Jacobi preconditioner from U diag.
        diagU = jnp.diagonal(Ublk, axis1=-2, axis2=-1).reshape(-1) + lam
        Minv = jnp.where(free6, 1.0 / jnp.maximum(diagU, 1e-8), 0.0)

        def matvec(x):
            y = _schur_matvec_obs(
                x, Ublk, Vinv, wJc, Jp, prob.obs_cam, prob.obs_point, lam, C, P
            )
            return jnp.where(free6, y, x)

        def cg_body(_, state):
            x, r, z, p = state
            Ap = matvec(p)
            rz = jnp.dot(r, z)
            alpha = rz / jnp.maximum(jnp.dot(p, Ap), 1e-12)
            x = x + alpha * p
            r2 = r - alpha * Ap
            z2 = Minv * r2
            beta = jnp.dot(r2, z2) / jnp.maximum(rz, 1e-12)
            return x, r2, z2, z2 + beta * p

        x0 = jnp.zeros_like(rhs)
        r0 = rhs
        z0 = Minv * r0
        dxc_flat, *_ = jax.lax.fori_loop(
            0, cg_iterations, cg_body, (x0, r0, z0, z0)
        )
        dxc = dxc_flat.reshape(C, 6)

        # Back-substitute points, matrix-free: W^T dx via per-obs pass.
        Jcdx = jnp.einsum("ori,oi->or", wJc, dxc[prob.obs_cam])
        WTdx = jax.ops.segment_sum(
            jnp.einsum("orj,or->oj", Jp, Jcdx), prob.obs_point, num_segments=P
        )
        dxp = jnp.einsum("pij,pj->pi", Vinv, bp - WTdx) * prob.point_valid[:, None]

        new_poses = jax.vmap(lie.se3_retract)(cam_poses, dxc * prob.cam_free[:, None])
        new_points = points + dxp
        new_cost = _robust_cost(prob, new_poses, new_points, intr, chi2_th, bf)
        # See ba_solve: cost stays finite under the behind-camera penalty even
        # for NaN states, so finiteness is an explicit accept condition.
        accept = (new_cost < cost) \
            & jnp.all(jnp.isfinite(new_poses)) \
            & jnp.all(jnp.isfinite(new_points))
        cam_poses = jnp.where(accept, new_poses, cam_poses)
        points = jnp.where(accept, new_points, points)
        lam = jnp.clip(jnp.where(
            accept, lam / lm_lambda_factor,
            lam * lm_lambda_factor * lm_lambda_factor), 1e-9, 1e6)
        cost = jnp.where(accept, new_cost, cost)
        return cam_poses, points, lam, cost

    cost0 = _robust_cost(prob, prob.cam_poses, prob.points, intr, chi2_th, bf)
    cam_poses, points, _, cost = jax.lax.fori_loop(
        0, iterations, lm_iter,
        (prob.cam_poses, prob.points, jnp.float32(lm_lambda0), cost0),
    )
    e, xc = _obs_residual(prob, cam_poses, points, intr, bf)
    chi2 = jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2
    chi2 = jnp.where(xc[..., 2] > 0, chi2, jnp.inf)
    return BAResult(cam_poses=cam_poses, points=points, obs_chi2=chi2, cost=cost)
