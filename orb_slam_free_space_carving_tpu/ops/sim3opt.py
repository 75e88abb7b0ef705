"""Sim3 guided matching + joint Sim3 optimization (loop-closure back half).

TPU re-design of the reference chain that follows the raw Sim3 RANSAC:

- ``ORBmatcher::SearchBySim3`` (``src/ORBmatcher.cc:1102-1326``): project each
  keyframe's map points into the *other* keyframe through the candidate Sim3,
  window-match descriptors in both directions, and keep mutually-consistent
  pairs.  Here both directions are one batched projection + masked Hamming
  matmul each (:func:`search_by_sim3`); the mutual check happens on host over
  the two returned index vectors.
- ``Optimizer::OptimizeSim3`` (``src/Optimizer.cc:1059-1254``): joint
  Gauss-Newton refinement of the 7-DoF Sim3 with bidirectional reprojection
  residuals and Huber(sqrt(10)) robustness, followed by a chi2<10 inlier count
  (:func:`optimize_sim3`).  The reference runs g2o LM with outlier removal at
  iteration 5; here the Huber IRLS weights play that role inside a fixed
  ``lax.fori_loop`` (static shapes, one compiled program).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.ops import matching
from orb_slam_free_space_carving_tpu.utils import camera, lie


@jax.jit
def search_by_sim3(
    s12: jnp.ndarray,          # [8] Sim3: cam2 coords -> cam1 coords
    x1c: jnp.ndarray,          # [P1,3] kf1 map points in cam1 frame
    desc1: jnp.ndarray,        # [P1,32]
    valid1: jnp.ndarray,       # [P1]
    maxdist1: jnp.ndarray,     # [P1] scale-invariance max distance
    x2c: jnp.ndarray,          # [P2,3] kf2 map points in cam2 frame
    desc2: jnp.ndarray,
    valid2: jnp.ndarray,
    maxdist2: jnp.ndarray,
    f1_uv: jnp.ndarray,        # kf1 feature pixels [N,2]
    f1_desc: jnp.ndarray,
    f1_oct: jnp.ndarray,
    f1_valid: jnp.ndarray,
    f2_uv: jnp.ndarray,
    f2_desc: jnp.ndarray,
    f2_oct: jnp.ndarray,
    f2_valid: jnp.ndarray,
    intr: jnp.ndarray,
    wh: jnp.ndarray,           # [2] image width/height
    scale_factor: float,
    n_levels: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Both guided-search directions of SearchBySim3 in one program.

    Returns (idx21[P2] -> kf1 feature, idx12[P1] -> kf2 feature); -1 where
    unmatched.  Window radius 7.5 * scale(pred_level) and the +-1 octave gate
    mirror ``ORBmatcher.cc:1163-1223``.
    """
    s21 = lie.sim3_inverse(s12)

    def direction(xc_src, desc_src, valid_src, maxd_src, sim, f_uv, f_desc,
                  f_oct, f_valid):
        x_in_dst = lie.sim3_apply(sim, xc_src)
        uv = camera.project(x_in_dst, intr)
        depth_ok = x_in_dst[..., 2] > 0.05
        inside = (
            (uv[:, 0] >= 0) & (uv[:, 0] < wh[0])
            & (uv[:, 1] >= 0) & (uv[:, 1] < wh[1])
        )
        dist3d = jnp.linalg.norm(x_in_dst, axis=-1)
        pred = camera.predict_scale_level(dist3d, maxd_src, scale_factor, n_levels)
        vis = depth_ok & inside & valid_src

        radii = 7.5 * scale_factor ** pred.astype(jnp.float32)
        dmat = matching.hamming_matrix(desc_src, f_desc)
        mask = matching.window_mask(uv, f_uv, radii, vis, f_valid)
        mask = mask & matching.octave_mask(pred, f_oct, -1, 1)
        idx, best = matching.masked_match(dmat, mask, max_dist=100.0, ratio=None)
        return matching._dedup_targets(idx, best, f_uv.shape[0])

    idx21 = direction(x2c, desc2, valid2, maxdist2, s12,
                      f1_uv, f1_desc, f1_oct, f1_valid)
    idx12 = direction(x1c, desc1, valid1, maxdist1, s21,
                      f2_uv, f2_desc, f2_oct, f2_valid)
    return idx21, idx12


# ---------------------------------------------------------------------------
# OptimizeSim3
# ---------------------------------------------------------------------------

class Sim3OptResult(NamedTuple):
    sim_12: jnp.ndarray     # [8] refined Sim3
    inliers: jnp.ndarray    # [P] bool
    n_inliers: jnp.ndarray  # scalar int


def _pair_residual(xi, s12, x1c, x2c, uv1, uv2, intr):
    """Bidirectional reprojection residual of one correspondence under the
    retracted Sim3 (the two edge types of ``Optimizer.cc:1129-1186``)."""
    S = lie.sim3_retract(s12, xi)
    e1 = camera.project(lie.sim3_apply(S, x2c), intr) - uv1
    e2 = camera.project(lie.sim3_apply(lie.sim3_inverse(S), x1c), intr) - uv2
    return jnp.concatenate([e1, e2])   # [4]


@functools.partial(jax.jit, static_argnames=("iterations", "fix_scale"))
def optimize_sim3(
    s12: jnp.ndarray,        # [8] initial Sim3 (cam2 -> cam1)
    x1c: jnp.ndarray,        # [P,3] matched kf1 points in cam1
    x2c: jnp.ndarray,        # [P,3] matched kf2 points in cam2
    uv1: jnp.ndarray,        # [P,2] observed pixels in kf1
    uv2: jnp.ndarray,        # [P,2] observed pixels in kf2
    inv_sigma2_1: jnp.ndarray,  # [P]
    inv_sigma2_2: jnp.ndarray,  # [P]
    mask: jnp.ndarray,       # [P] bool
    intr: jnp.ndarray,
    iterations: int = 10,
    chi2_th: float = 10.0,
    fix_scale: bool = False,
) -> Sim3OptResult:
    """Joint GN on the Sim3 with Huber(sqrt(10)) IRLS (OptimizeSim3 semantics:
    deltaHuber = sqrt(10) ``Optimizer.cc:1102``, outlier gate chi2 > 10
    ``:1192-1204``)."""
    P = x1c.shape[0]
    res_fn = jax.vmap(_pair_residual, in_axes=(None, None, 0, 0, 0, 0, None))
    jac_fn = jax.vmap(
        jax.jacfwd(_pair_residual, argnums=0),
        in_axes=(None, None, 0, 0, 0, 0, None),
    )
    zero = jnp.zeros((7,), s12.dtype)
    delta2 = chi2_th   # Huber delta^2 on the chi2 scale

    def chi2_of(r):
        c1 = jnp.sum(r[:, :2] ** 2, axis=-1) * inv_sigma2_1
        c2 = jnp.sum(r[:, 2:] ** 2, axis=-1) * inv_sigma2_2
        return c1, c2

    def gn_iter(_, s):
        r = res_fn(zero, s, x1c, x2c, uv1, uv2, intr)      # [P,4]
        J = jac_fn(zero, s, x1c, x2c, uv1, uv2, intr)      # [P,4,7]
        c1, c2 = chi2_of(r)
        # Per-edge Huber IRLS weight (robustified on each direction).
        w1 = jnp.where(c1 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(c1, 1e-12)))
        w2 = jnp.where(c2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(c2, 1e-12)))
        w = jnp.concatenate([
            (w1 * inv_sigma2_1)[:, None].repeat(2, 1),
            (w2 * inv_sigma2_2)[:, None].repeat(2, 1),
        ], axis=1) * mask[:, None]                          # [P,4]
        H = jnp.einsum("pri,pr,prj->ij", J, w, J)
        b = jnp.einsum("pri,pr,pr->i", J, w, r)
        if fix_scale:
            # Zero out the scale row/col (tangent component 6).
            sel = jnp.arange(7) < 6
            H = jnp.where(sel[:, None] & sel[None, :], H, jnp.eye(7, dtype=H.dtype))
            b = jnp.where(sel, b, 0.0)
        H = H + 1e-6 * jnp.eye(7, dtype=H.dtype)
        dx = -jnp.linalg.solve(H, b)
        return lie.sim3_retract(s, dx)

    s_opt = jax.lax.fori_loop(0, iterations, gn_iter, s12)
    r = res_fn(zero, s_opt, x1c, x2c, uv1, uv2, intr)
    c1, c2 = chi2_of(r)
    inl = (c1 < chi2_th) & (c2 < chi2_th) & mask
    return Sim3OptResult(sim_12=s_opt, inliers=inl, n_inliers=jnp.sum(inl))


@jax.jit
def search_by_projection_scw(
    scw: jnp.ndarray,         # [8] Sim3 world -> kf camera (corrected Scw)
    pts_w: jnp.ndarray,       # [P,3] loop-neighborhood map points (world)
    desc: jnp.ndarray,        # [P,32]
    valid: jnp.ndarray,       # [P]
    maxdist: jnp.ndarray,     # [P]
    normal: jnp.ndarray,      # [P,3] mean viewing direction (world)
    f_uv: jnp.ndarray,
    f_desc: jnp.ndarray,
    f_oct: jnp.ndarray,
    f_valid: jnp.ndarray,
    f_free: jnp.ndarray,      # [N] feature not yet bound to a loop point
    intr: jnp.ndarray,
    wh: jnp.ndarray,
    scale_factor: float,
    n_levels: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """SearchByProjection with a Sim3 camera pose (``ORBmatcher.cc:290-403``):
    project loop points through Scw, gate by frustum + distance band + viewing
    angle, window-match (radius th=10 * scale(pred)).

    Returns (idx[P] -> feature, n_matches)."""
    xc = lie.sim3_apply(scw, pts_w)
    uv = camera.project(xc, intr)
    depth_ok = xc[..., 2] > 0.05
    inside = (
        (uv[:, 0] >= 0) & (uv[:, 0] < wh[0])
        & (uv[:, 1] >= 0) & (uv[:, 1] < wh[1])
    )
    # Distance band [0.8*min, 1.2*max] and view-cos gate (:322-343).
    cam_center_w = lie.sim3_apply(lie.sim3_inverse(scw), jnp.zeros((1, 3)))[0]
    po = pts_w - cam_center_w
    dist3d = jnp.linalg.norm(po, axis=-1)
    mindist = maxdist / (scale_factor ** (n_levels - 1))
    band = (dist3d >= 0.8 * mindist) & (dist3d <= 1.2 * maxdist)
    vcos = jnp.sum(po * normal, axis=-1) / jnp.maximum(dist3d, 1e-9)
    vis = depth_ok & inside & band & (vcos >= 0.5) & valid

    pred = camera.predict_scale_level(dist3d, maxdist, scale_factor, n_levels)
    radii = 10.0 * scale_factor ** pred.astype(jnp.float32)
    dmat = matching.hamming_matrix(desc, f_desc)
    mask = matching.window_mask(uv, f_uv, radii, vis, f_valid & f_free)
    mask = mask & matching.octave_mask(pred, f_oct, -1, 1)
    idx, best = matching.masked_match(dmat, mask, max_dist=50.0, ratio=None)
    idx = matching._dedup_targets(idx, best, f_uv.shape[0])
    return idx, jnp.sum(idx >= 0)
