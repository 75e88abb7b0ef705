"""Batched DLT triangulation + geometric validity checks.

TPU re-design of the reference's per-match triangulation scattered across
``Initializer::Triangulate`` (reference ``src/Initializer.cc:734-747``) and the
inline SVD triangulation in ``LocalMapping::CreateNewMapPoints``
(``src/LocalMapping.cc:297-463``): every candidate match is triangulated at
once as a vmapped 4x4 least-squares problem, and the reference's acceptance
cascade (parallax, cheirality, reprojection chi2, scale consistency) becomes
boolean mask reductions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.utils import lie


def projection_matrix(pose_cw, intr):
    """K [R|t] as [...,3,4] from pose7 + intrinsics vector."""
    R, t = lie.se3_to_Rt(pose_cw)
    K = jnp.zeros(pose_cw.shape[:-1] + (3, 3), dtype=pose_cw.dtype)
    K = K.at[..., 0, 0].set(intr[0]).at[..., 1, 1].set(intr[1])
    K = K.at[..., 0, 2].set(intr[2]).at[..., 1, 2].set(intr[3])
    K = K.at[..., 2, 2].set(1.0)
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def triangulate_dlt(uv1, uv2, P1, P2):
    """Linear triangulation of pixel correspondences.

    uv1, uv2: [...,2] undistorted pixel coords; P1, P2: [...,3,4] projection
    matrices (broadcastable).  Returns world points [...,3].

    Mirrors ``Initializer::Triangulate`` (``src/Initializer.cc:734-747``): build
    A[4,4] from cross-product rows, take the null vector.  SVD of a 4x4 is tiny;
    vmapped over the match batch it is one batched linear-algebra call on TPU.
    """
    rows = [
        uv1[..., 0:1, None] * P1[..., 2:3, :] - P1[..., 0:1, :],
        uv1[..., 1:2, None] * P1[..., 2:3, :] - P1[..., 1:2, :],
        uv2[..., 0:1, None] * P2[..., 2:3, :] - P2[..., 0:1, :],
        uv2[..., 1:2, None] * P2[..., 2:3, :] - P2[..., 1:2, :],
    ]
    A = jnp.concatenate(rows, axis=-2)  # [...,4,4]
    # Row-normalize (pixel-scale rows are badly conditioned in f32), then
    # take the null vector of B = A^T A via its closed-form ADJUGATE: for a
    # rank-3 symmetric B, adj(B) = prod(nonzero eigenvalues) * v v^T with v
    # the null vector, so the largest column of adj(B) IS the null direction
    # (exact; near-rank-3 it is dominated by the smallest-eigenvector term).
    # This replaces a [batch,4,4] jnp.linalg.svd — batched tiny SVDs are the
    # slowest op on TPU by an order of magnitude (scripts/probe_stage_times:
    # the 20-neighbor triangulation batch spent ~150 ms in them) — with pure
    # elementwise cofactor math.  The downstream GN polish
    # (:func:`refine_triangulation`) removes the conditioning penalty of
    # squaring into B.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    B = jnp.einsum("...ij,...ik->...jk", A, A)
    adj = _adjugate4(B)
    n2 = jnp.sum(adj * adj, axis=-2)                       # column norms^2
    j = jnp.argmax(n2, axis=-1)
    X = jnp.take_along_axis(
        adj, j[..., None, None].repeat(4, axis=-2), axis=-1
    )[..., 0]                                              # [...,4]
    wcoord = X[..., 3:4]
    safe = jnp.where(jnp.abs(wcoord) < 1e-12, 1e-12, wcoord)
    return X[..., :3] / safe


def _adjugate4(B):
    """Closed-form adjugate of [...,4,4] via 2x2 sub-determinants (the
    standard GLM inverse formulation, batched elementwise)."""
    b = lambda i, j: B[..., i, j]
    s0 = b(0, 0) * b(1, 1) - b(1, 0) * b(0, 1)
    s1 = b(0, 0) * b(1, 2) - b(1, 0) * b(0, 2)
    s2 = b(0, 0) * b(1, 3) - b(1, 0) * b(0, 3)
    s3 = b(0, 1) * b(1, 2) - b(1, 1) * b(0, 2)
    s4 = b(0, 1) * b(1, 3) - b(1, 1) * b(0, 3)
    s5 = b(0, 2) * b(1, 3) - b(1, 2) * b(0, 3)
    c5 = b(2, 2) * b(3, 3) - b(3, 2) * b(2, 3)
    c4 = b(2, 1) * b(3, 3) - b(3, 1) * b(2, 3)
    c3 = b(2, 1) * b(3, 2) - b(3, 1) * b(2, 2)
    c2 = b(2, 0) * b(3, 3) - b(3, 0) * b(2, 3)
    c1 = b(2, 0) * b(3, 2) - b(3, 0) * b(2, 2)
    c0 = b(2, 0) * b(3, 1) - b(3, 0) * b(2, 1)
    adj = jnp.stack([
        jnp.stack([
            b(1, 1) * c5 - b(1, 2) * c4 + b(1, 3) * c3,
            -b(0, 1) * c5 + b(0, 2) * c4 - b(0, 3) * c3,
            b(3, 1) * s5 - b(3, 2) * s4 + b(3, 3) * s3,
            -b(2, 1) * s5 + b(2, 2) * s4 - b(2, 3) * s3,
        ], axis=-1),
        jnp.stack([
            -b(1, 0) * c5 + b(1, 2) * c2 - b(1, 3) * c1,
            b(0, 0) * c5 - b(0, 2) * c2 + b(0, 3) * c1,
            -b(3, 0) * s5 + b(3, 2) * s2 - b(3, 3) * s1,
            b(2, 0) * s5 - b(2, 2) * s2 + b(2, 3) * s1,
        ], axis=-1),
        jnp.stack([
            b(1, 0) * c4 - b(1, 1) * c2 + b(1, 3) * c0,
            -b(0, 0) * c4 + b(0, 1) * c2 - b(0, 3) * c0,
            b(3, 0) * s4 - b(3, 1) * s2 + b(3, 3) * s0,
            -b(2, 0) * s4 + b(2, 1) * s2 - b(2, 3) * s0,
        ], axis=-1),
        jnp.stack([
            -b(1, 0) * c3 + b(1, 1) * c1 - b(1, 2) * c0,
            b(0, 0) * c3 - b(0, 1) * c1 + b(0, 2) * c0,
            -b(3, 0) * s3 + b(3, 1) * s1 - b(3, 2) * s0,
            b(2, 0) * s3 - b(2, 1) * s1 + b(2, 2) * s0,
        ], axis=-1),
    ], axis=-2)
    return adj


def refine_triangulation(points_w, uv1, uv2, pose1, pose2, intr,
                         iterations: int = 3):
    """Per-point Gauss-Newton polish of DLT output (two-view reprojection).

    f32 DLT leaves ~0.5% relative depth error; 2-3 GN steps on the 3-parameter
    point (J is [4,3], solve 3x3) reach the reprojection noise floor.  All
    points refine in parallel.  (The reference leans on g2o BA for the same
    cleanup; this keeps standalone triangulation accurate.)
    """
    from orb_slam_free_space_carving_tpu.utils import camera as cam

    def resid_one(Xp, a, b):
        r1 = cam.project(lie.se3_apply(pose1, Xp), intr) - a
        r2 = cam.project(lie.se3_apply(pose2, Xp), intr) - b
        return jnp.concatenate([r1, r2])

    jac_one = jax.jacfwd(resid_one, argnums=0)

    def step(X, _):
        r = jax.vmap(resid_one)(X, uv1, uv2)           # [N,4]
        J = jax.vmap(jac_one)(X, uv1, uv2)             # [N,4,3]
        H = jnp.einsum("nij,nik->njk", J, J) + 1e-6 * jnp.eye(3)
        g = jnp.einsum("nij,ni->nj", J, r)
        dx = -jnp.linalg.solve(H, g[..., None])[..., 0]
        return X + dx, None

    X, _ = jax.lax.scan(step, points_w, None, length=iterations)
    return X


def reprojection_error2(points_w, pose_cw, intr, uv_obs):
    """Squared pixel reprojection error [...,]; also returns depth."""
    from orb_slam_free_space_carving_tpu.utils import camera

    xc = lie.se3_apply(pose_cw, points_w)
    uv = camera.project(xc, intr)
    err2 = jnp.sum((uv - uv_obs) ** 2, axis=-1)
    return err2, xc[..., 2]


def parallax_cos(points_w, center1, center2):
    """cos of the ray angle at each triangulated point [...,]."""
    r1 = points_w - center1
    r2 = points_w - center2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-12)


def check_triangulation(points_w, pose1, pose2, intr, uv1, uv2,
                        sigma2_1, sigma2_2, chi2_th: float = 5.991,
                        min_parallax_cos: float = 0.9998):
    """The acceptance cascade of ``CreateNewMapPoints``
    (``src/LocalMapping.cc:354-437``): finite, positive depth in both views,
    sufficient parallax, reprojection chi2 below threshold scaled by the
    detection level's sigma2.

    Returns boolean mask [...].
    """
    err1, z1 = reprojection_error2(points_w, pose1, intr, uv1)
    err2, z2 = reprojection_error2(points_w, pose2, intr, uv2)
    c1 = lie.se3_inverse(pose1)[..., 4:7]
    c2 = lie.se3_inverse(pose2)[..., 4:7]
    pcos = parallax_cos(points_w, c1, c2)
    ok = jnp.isfinite(points_w).all(axis=-1)
    ok &= (z1 > 0) & (z2 > 0)
    ok &= pcos < min_parallax_cos
    ok &= err1 <= chi2_th * sigma2_1
    ok &= err2 <= chi2_th * sigma2_2
    return ok
