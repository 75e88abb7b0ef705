"""Batched PnP RANSAC for relocalization.

TPU replacement for ``PnPsolver`` (reference ``src/PnPsolver.cc``), which runs
EPnP (4 control points + beta Gauss-Newton) inside a custom sequential RANSAC
``iterate(nIts)`` loop.  Here every RANSAC hypothesis is a vmapped 6-point DLT
camera resection (same algebraic family EPnP reduces to), scored jointly as an
[S,N] reprojection-error matrix; the winner is polished by the shared
motion-only GN (:mod:`ops.pose_opt`) exactly as the reference refines with
``mRefinedTcw`` (``PnPsolver.cc:243-292``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.ops import pose_opt
from orb_slam_free_space_carving_tpu.utils import camera, lie


class PnPResult(NamedTuple):
    ok: jnp.ndarray
    pose: jnp.ndarray      # [7] Tcw
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def _dlt_resection(pts_w, uv_n, row_weight=None):
    """6+ point DLT: solve P[3,4] from world points and normalized image coords.

    ``row_weight`` (optional, [n]) scales each correspondence's rows after
    normalization — zero-weight rows drop out, so a FIXED-size point set can
    be refit over a dynamic inlier subset without dynamic shapes (the
    locally-optimized RANSAC refit below).

    Returns (R, t) with orthonormality enforced by SVD projection.
    """
    n = pts_w.shape[0]
    X = jnp.concatenate([pts_w, jnp.ones((n, 1), pts_w.dtype)], axis=-1)  # [n,4]
    zero = jnp.zeros_like(X)
    u = uv_n[:, 0:1]
    v = uv_n[:, 1:2]
    r1 = jnp.concatenate([X, zero, -u * X], axis=-1)   # [n,12]
    r2 = jnp.concatenate([zero, X, -v * X], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)              # [2n,12]
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    if row_weight is not None:
        w2 = jnp.concatenate([row_weight, row_weight], axis=0)[:, None]
        A = A * w2
    _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
    p = Vt[-1].reshape(3, 4)
    M = p[:, :3]
    # Fix sign: points must be in front (positive depth on average; weighted
    # so refit outliers don't vote).
    depths = X @ p.T[:, 2:3]
    if row_weight is not None:
        depths = depths * row_weight[:, None]
    sgn = jnp.sign(jnp.sum(depths)) + (jnp.sum(depths) == 0)
    p = p * sgn
    M = p[:, :3]
    # Project M onto SO(3) and recover scale: M = s R.
    U, S, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    R = U @ D @ Vt2
    s = jnp.maximum(jnp.mean(S), 1e-12)
    t = p[:, 3] / s
    return R, t


def solve_pnp_ransac(
    pts_w: jnp.ndarray,       # [N,3] map points
    uv: jnp.ndarray,          # [N,2] undistorted pixel observations
    mask: jnp.ndarray,        # [N] valid-match mask
    intr: jnp.ndarray,
    key: jax.Array,
    n_samples: int = 128,
    chi2_th: float = 5.991,
    inv_sigma2: jnp.ndarray | None = None,
    min_inliers: int = 10,
    match_dist: jnp.ndarray | None = None,
) -> PnPResult:
    """RANSAC resection + GN polish (behavioral ``PnPsolver::iterate`` +
    the reloc pose-opt chain ``Tracking.cc:1413-1483``).

    ``match_dist`` (optional, [N]): descriptor distance of each 2D-3D match.
    When given, hypothesis sampling is biased toward low-distance matches
    (PROSAC-style progressive sampling, batched): on node-gated BoW match
    sets at ~30% inlier rate a uniform 6-point draw is all-inlier with
    p~7e-4, while distance-ordered draws concentrate on the confident
    matches whose inlier rate is 2-3x higher — the difference between ~30%
    and near-certain per-attempt relocalization at the same 512 hypotheses.
    A locally-optimized refit (DLT over ALL inliers of the best hypothesis,
    then rescore) replaces the raw minimal-sample pose before GN polish.
    """
    N = pts_w.shape[0]
    if inv_sigma2 is None:
        inv_sigma2 = jnp.ones((N,), pts_w.dtype)
    uv_n = camera.pixel_to_normalized(uv, intr)

    if match_dist is None:
        logits = jnp.where(mask, 0.0, -jnp.inf)
    else:
        # Temperature 8 Hamming bits: a d=25 match is e^~3 likelier per
        # draw than a d=50 one; invalid lanes never sampled.
        logits = jnp.where(mask, -match_dist / 8.0, -jnp.inf)
    keys = jax.random.split(key, n_samples)

    def hypothesis(k):
        g = jax.random.gumbel(k, (N,)) + logits
        idx = jax.lax.top_k(g, 6)[1]
        R, t = _dlt_resection(pts_w[idx], uv_n[idx])
        return lie.se3_from_Rt(R, t)

    poses = jax.vmap(hypothesis)(keys)  # [S,7]

    def score(pose):
        xc = lie.se3_apply(pose, pts_w)
        uvp = camera.project(xc, intr)
        chi2 = jnp.sum((uvp - uv) ** 2, axis=-1) * inv_sigma2
        inl = (chi2 < chi2_th) & (xc[..., 2] > 0) & mask
        return jnp.sum(inl), inl

    n_inl, inls = jax.vmap(score)(poses)
    best = jnp.argmax(n_inl)
    pose0 = poses[best]

    # Locally-optimized refit: weighted DLT over every inlier of the best
    # minimal hypothesis (fixed shapes — zero-weight rows drop out), keep it
    # if it scores at least as well.
    w = inls[best].astype(pts_w.dtype)
    R_lo, t_lo = _dlt_resection(pts_w, uv_n, row_weight=w)
    pose_lo = lie.se3_from_Rt(R_lo, t_lo)
    n_lo, inl_lo = score(pose_lo)
    use_lo = n_lo >= n_inl[best]
    pose0 = jnp.where(use_lo, pose_lo, pose0)
    inl0 = jnp.where(use_lo, inl_lo, inls[best])

    refined = pose_opt.optimize_pose(
        pose0, pts_w, uv, inv_sigma2, inl0, intr, chi2_th=chi2_th
    )
    ok = refined.n_inliers >= min_inliers
    return PnPResult(
        ok=ok, pose=refined.pose, inliers=refined.inliers,
        n_inliers=refined.n_inliers,
    )
