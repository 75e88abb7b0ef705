"""Horn closed-form absolute orientation + batched Sim3 RANSAC.

TPU replacement for ``Sim3Solver`` (reference ``src/Sim3Solver.cc``): RANSAC
over 3-point sets, each solved with Horn's quaternion method (eigen-decomp of
the 4x4 N matrix, ``Sim3Solver::ComputeSim3`` ``:226-337``) with optional
scale, scored by bidirectional reprojection (``CheckInliers`` ``:340-365``).
All hypotheses solve and score in parallel as one vmapped batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.utils import camera, lie


def horn_alignment(x: jnp.ndarray, y: jnp.ndarray, weights=None, fix_scale: bool = False):
    """Closed-form similarity y ~ s R x + t from paired 3D points [...,K,3].

    Horn 1987 quaternion method, batched: build the 4x4 N matrix from the
    cross-covariance, take its dominant eigenvector as the rotation quaternion
    (``Sim3Solver.cc:251-301``), then the symmetric scale estimate (:303-317).
    """
    if weights is None:
        weights = jnp.ones(x.shape[:-1], x.dtype)
    w = weights[..., None]
    n = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)[..., None]
    cx = jnp.sum(x * w, axis=-2, keepdims=True) / n
    cy = jnp.sum(y * w, axis=-2, keepdims=True) / n
    xc = (x - cx) * w
    yc = (y - cy) * w

    # Cross covariance S_ab = sum x_a y_b (source x target, Horn's convention;
    # the transpose recovers the INVERSE rotation).
    M = jnp.einsum("...ki,...kj->...ij", xc, (y - cy))
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, -1]  # largest eigenvalue -> rotation quat [w,x,y,z]
    q = lie.quat_normalize(q)

    Rx = lie.quat_rotate(q[..., None, :], x - cx)
    if fix_scale:
        s = jnp.ones(x.shape[:-2], x.dtype)
    else:
        # Symmetric scale (Horn): s = sum(y_c . R x_c) / sum |x_c|^2.
        num = jnp.sum(jnp.sum((y - cy) * Rx, axis=-1) * weights, axis=-1)
        den = jnp.sum(jnp.sum((x - cx) ** 2, axis=-1) * weights, axis=-1)
        s = num / jnp.maximum(den, 1e-12)
    t = cy[..., 0, :] - s[..., None] * lie.quat_rotate(q, cx[..., 0, :])
    return jnp.concatenate([q, t, s[..., None]], axis=-1)  # sim3 [...,8]


class Sim3RansacResult(NamedTuple):
    ok: jnp.ndarray
    sim_12: jnp.ndarray    # [8] Sim3 mapping frame-2 camera points into frame 1
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def solve_sim3_ransac(
    x1_c: jnp.ndarray,     # [N,3] matched points in camera frame 1
    x2_c: jnp.ndarray,     # [N,3] matched points in camera frame 2
    mask: jnp.ndarray,     # [N]
    intr: jnp.ndarray,
    key: jax.Array,
    n_samples: int = 256,
    fix_scale: bool = False,
    chi2_th1: float = 9.210,
    chi2_th2: float = 9.210,
    min_inliers: int = 20,
) -> Sim3RansacResult:
    """Batched Sim3 RANSAC (``Sim3Solver::iterate`` ``:140-224`` semantics).

    chi2 thresholds 9.210 are the reference's 99% 2-DoF gates
    (``Sim3Solver.cc:60-61`` mvnMaxError with sigma2).
    Inlier test is bidirectional pixel reprojection (``:340-365``).
    """
    N = x1_c.shape[0]
    logits = jnp.where(mask, 0.0, -jnp.inf)
    keys = jax.random.split(key, n_samples)

    def hypothesis(k):
        g = jax.random.gumbel(k, (N,)) + logits
        idx = jax.lax.top_k(g, 3)[1]
        # horn_alignment(a, b) maps a -> b; we want sim with x1 ~ sim(x2).
        return horn_alignment(x2_c[idx], x1_c[idx], fix_scale=fix_scale)

    sims = jax.vmap(hypothesis)(keys)  # [S,8] sim s.t. x1 ~ sim(x2)

    def score(sim):
        x1_pred = lie.sim3_apply(sim, x2_c)
        x2_pred = lie.sim3_apply(lie.sim3_inverse(sim), x1_c)
        uv1_pred = camera.project(x1_pred, intr)
        uv1_obs = camera.project(x1_c, intr)
        uv2_pred = camera.project(x2_pred, intr)
        uv2_obs = camera.project(x2_c, intr)
        e1 = jnp.sum((uv1_pred - uv1_obs) ** 2, axis=-1)
        e2 = jnp.sum((uv2_pred - uv2_obs) ** 2, axis=-1)
        inl = (e1 < chi2_th1) & (e2 < chi2_th2) & mask
        return jnp.sum(inl), inl

    n_inl, inls = jax.vmap(score)(sims)
    best = jnp.argmax(n_inl)
    # Refit on all inliers of the best hypothesis (polish).
    wbest = inls[best].astype(x1_c.dtype)
    sim = horn_alignment(x2_c, x1_c, weights=wbest, fix_scale=fix_scale)
    n_fin, inl_fin = score(sim)
    use_refit = n_fin >= n_inl[best]
    sim = jnp.where(use_refit, sim, sims[best])
    inl = jnp.where(use_refit, inl_fin, inls[best])
    n = jnp.maximum(n_fin, n_inl[best])
    return Sim3RansacResult(
        ok=n >= min_inliers, sim_12=sim, inliers=inl, n_inliers=n
    )
