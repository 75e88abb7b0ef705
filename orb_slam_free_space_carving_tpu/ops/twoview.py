"""Two-view monocular bootstrap: batched H/F RANSAC + motion recovery.

TPU re-design of ``Initializer`` (reference ``src/Initializer.cc``).  The
reference runs two CPU threads, one RANSAC loop each for a homography H and a
fundamental matrix F over the same 8-point sample sets (``:44-122``).  Here the
*entire* RANSAC family is one batched computation: S minimal sample sets are
solved simultaneously with vmapped normalized DLT (``:226-303`` behavior), all
S models are scored against all N matches as one [S,N] symmetric-transfer-error
matrix (``:305-468``), and both model families share one sampling pass.  Model
selection keeps the reference rule RH = SH/(SH+SF) > 0.40 (``:100-122``), and
motion recovery mirrors ``ReconstructF`` (E -> 4 motions, cheirality vote,
``:470-570``) and ``ReconstructH`` (Faugeras 8 motions, ``:572-732``) as a
single batched triangulate-and-vote over all candidate motions.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from orb_slam_free_space_carving_tpu.ops import triangulation as tri
from orb_slam_free_space_carving_tpu.utils import lie

# Reference scoring thresholds (Initializer.cc:305-468).
TH_H = 5.991     # chi2 for homography symmetric transfer
TH_F = 3.841     # chi2 for point-line distance
TH_SCORE = 5.991  # score offset used for both models


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # scalar bool
    pose21: jnp.ndarray      # [7] pose of view 2 w.r.t. view 1 (Tcw with view1=world)
    points: jnp.ndarray      # [N,3] triangulated points (view-1/world frame)
    inliers: jnp.ndarray     # [N] bool: triangulated & accepted
    used_h: jnp.ndarray      # scalar bool: homography model chosen


def _normalize_points(uv, mask):
    """Hartley normalization with invalid entries excluded (Initializer.cc:756-796)."""
    w = mask.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    meandev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(meandev, 1e-9)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]],
        dtype=uv.dtype,
    )
    return (uv - mean) * s, T


def _solve_f(p1, p2, w=None):
    """Normalized 8-point fundamental (least squares for n>8; optional row
    weights for inlier-refit)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    )  # [n,9]
    if w is not None:
        A = A * w[:, None]
    AtA = A.T @ A
    _, v = jnp.linalg.eigh(AtA)
    F = v[:, 0].reshape(3, 3)
    # Enforce rank 2 (Initializer.cc:292-303).
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt


def _solve_h(p1, p2, w=None):
    """DLT homography (least squares for n>4; optional row weights)."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # [2n,9]
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    AtA = A.T @ A
    _, v = jnp.linalg.eigh(AtA)
    return v[:, 0].reshape(3, 3)


def _h_transfer_err2(H, uv1, uv2):
    """Squared transfer error of H: uv1 -> uv2, per match [N]."""
    p = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1) @ H.T
    w = jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
    return jnp.sum((p[:, :2] / w - uv2) ** 2, axis=-1)


def _f_epiline_err2(F, uv1, uv2):
    """Squared point-to-epiline distance of uv2 from F uv1, per match [N]."""
    p1 = jnp.concatenate([uv1, jnp.ones_like(uv1[:, :1])], axis=-1)
    l2 = p1 @ F.T  # [N,3] lines in image 2
    num = (jnp.sum(l2[:, :2] * uv2, axis=-1) + l2[:, 2]) ** 2
    den = jnp.maximum(jnp.sum(l2[:, :2] ** 2, axis=-1), 1e-12)
    return num / den


def _score_h(H, uv1, uv2, mask, sigma2: float):
    """CheckHomography scoring (Initializer.cc:305-386): symmetric transfer."""
    Hinv = jnp.linalg.inv(H)
    e12 = _h_transfer_err2(H, uv1, uv2) / sigma2
    e21 = _h_transfer_err2(Hinv, uv2, uv1) / sigma2
    in12 = e12 < TH_H
    in21 = e21 < TH_H
    s = jnp.where(in12, TH_SCORE - e12, 0.0) + jnp.where(in21, TH_SCORE - e21, 0.0)
    inl = in12 & in21 & mask
    return jnp.sum(s * mask), inl


def _score_f(F, uv1, uv2, mask, sigma2: float):
    """CheckFundamental scoring (Initializer.cc:388-468)."""
    e12 = _f_epiline_err2(F, uv1, uv2) / sigma2          # line in img2
    e21 = _f_epiline_err2(F.T, uv2, uv1) / sigma2        # line in img1
    in12 = e12 < TH_F
    in21 = e21 < TH_F
    s = jnp.where(in12, TH_SCORE - e12, 0.0) + jnp.where(in21, TH_SCORE - e21, 0.0)
    inl = in12 & in21 & mask
    return jnp.sum(s * mask), inl


def _candidate_motions_from_f(F, K):
    """E = K'FK -> 4 (R,t) candidates [4,...] (ReconstructF :470-510)."""
    E = K.T @ F @ K
    U, _, Vt = jnp.linalg.svd(E)
    # Proper rotations.
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=F.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _candidate_motions_from_h(H, K):
    """Faugeras SVD decomposition of A = K^-1 H K -> 8 motions
    (ReconstructH :572-732)."""
    A = jnp.linalg.inv(K) @ H @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = w[0], w[1], w[2]

    eps = 1e-12
    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x1s = jnp.array([1.0, 1.0, -1.0, -1.0]) * aux1
    x3s = jnp.array([1.0, -1.0, 1.0, -1.0]) * aux3

    Rs, ts = [], []
    # case d' = +d2 (:618-658)
    st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, eps
    )
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    zero = jnp.array(0.0)
    one = jnp.array(1.0)
    for i in range(4):
        sgn = jnp.sign(x1s[i] * x3s[i] + 1e-30)
        stheta = st * sgn
        Rp = jnp.stack(
            [
                jnp.stack([ct, zero, -stheta]),
                jnp.stack([zero, one, zero]),
                jnp.stack([stheta, zero, ct]),
            ]
        )
        tp = jnp.stack([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        Rs.append(s * (U @ Rp @ Vt))
        ts.append(U @ tp)
    # case d' = -d2 (:660-700)
    sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, eps
    )
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    for i in range(4):
        sgn = jnp.sign(x1s[i] * x3s[i] + 1e-30)
        sphi = sp * sgn
        Rp = jnp.stack(
            [
                jnp.stack([cp, zero, sphi]),
                jnp.stack([zero, -one, zero]),
                jnp.stack([sphi, zero, -cp]),
            ]
        )
        tp = jnp.stack([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        Rs.append(s * (U @ Rp @ Vt))
        ts.append(U @ tp)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    ts = ts / jnp.maximum(jnp.linalg.norm(ts, axis=-1, keepdims=True), 1e-12)
    return Rs, ts


def _vote_motion(Rs, ts, uv1, uv2, mask, intr, chi2_th: float, sigma2):
    """Triangulate all matches under each candidate motion; count good points.

    Batched ``CheckRT`` (``Initializer.cc:798-907``).  Returns per-candidate
    (ngood [C], points [C,N,3], good [C,N], parallax_ok [C]).
    """
    C = Rs.shape[0]
    pose1 = lie.se3_identity((C,))
    pose2 = jax.vmap(lie.se3_from_Rt)(Rs, ts)
    P1 = jax.vmap(lambda p: tri.projection_matrix(p, intr))(pose1)
    P2 = jax.vmap(lambda p: tri.projection_matrix(p, intr))(pose2)
    pts = jax.vmap(
        lambda P2c: tri.triangulate_dlt(uv1, uv2, P1[0], P2c)
    )(P2)  # [C,N,3]
    # f32 DLT alone leaves reprojection residuals beyond the 4 px^2 gate; the
    # reference's f64 SVD does not.  A short GN polish restores parity.
    pts = jax.vmap(
        lambda p, pose2c: tri.refine_triangulation(
            p, uv1, uv2, pose1[0], pose2c, intr, iterations=2
        )
    )(pts, pose2)
    good = jax.vmap(
        lambda p, pose2c: tri.check_triangulation(
            p, pose1[0], pose2c, intr, uv1, uv2, sigma2, sigma2,
            chi2_th=chi2_th,
        )
    )(pts, pose2)
    good = good & mask[None, :]
    ngood = jnp.sum(good, axis=1)
    return ngood, pts, good, pose2


def initialize_two_view(
    uv1: jnp.ndarray,          # [N,2] undistorted pixels, frame 1
    uv2: jnp.ndarray,          # [N,2] matched pixels, frame 2
    mask: jnp.ndarray,         # [N] valid-match mask
    intr: jnp.ndarray,         # intrinsics vector
    key: jax.Array,
    n_samples: int = 256,
    sigma: float = 1.0,
    min_inliers: int = 50,
    min_triangulated_ratio: float = 0.9,
) -> TwoViewResult:
    """Full monocular bootstrap (``Initializer::Initialize`` behavior).

    N must be static.  All RANSAC hypotheses for both models are evaluated in
    parallel; the final motion is chosen by the reference's cheirality vote.
    """
    N = uv1.shape[0]
    sigma2 = sigma * sigma
    K = jnp.array(
        [[intr[0], 0.0, intr[2]], [0.0, intr[1], intr[3]], [0.0, 0.0, 1.0]],
        dtype=uv1.dtype,
    )

    # --- shared minimal sample sets (8 matches each, valid-only via gumbel trick)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    keys = jax.random.split(key, n_samples)

    def sample_idx(k):
        g = jax.random.gumbel(k, (N,)) + logits
        return jax.lax.top_k(g, 8)[1]

    samples = jax.vmap(sample_idx)(keys)  # [S,8]

    # --- normalize all points once
    n1, T1 = _normalize_points(uv1, mask)
    n2, T2 = _normalize_points(uv2, mask)

    def fit_and_score(idx):
        p1 = n1[idx]
        p2 = n2[idx]
        Fn = _solve_f(p1, p2)
        F = T2.T @ Fn @ T1
        F = F / jnp.maximum(jnp.abs(F[2, 2]), 1e-12)
        Hn = _solve_h(p1, p2)
        H = jnp.linalg.inv(T2) @ Hn @ T1
        H = H / jnp.maximum(jnp.abs(H[2, 2]), 1e-12)
        sf, _ = _score_f(F, uv1, uv2, mask, sigma2)
        sh, _ = _score_h(H, uv1, uv2, mask, sigma2)
        return F, sf, H, sh

    Fs, sfs, Hs, shs = jax.vmap(fit_and_score)(samples)
    bf = jnp.argmax(sfs)
    bh = jnp.argmax(shs)
    F_best, SF = Fs[bf], sfs[bf]
    H_best, SH = Hs[bh], shs[bh]
    _, inl_f = _score_f(F_best, uv1, uv2, mask, sigma2)
    _, inl_h = _score_h(H_best, uv1, uv2, mask, sigma2)

    # All-inlier refit of each model (gold-standard second step; tightens the
    # recovered epipolar geometry well beyond one minimal sample).
    wf = inl_f.astype(uv1.dtype)
    F_refit = T2.T @ _solve_f(n1, n2, wf) @ T1
    F_refit = F_refit / jnp.maximum(jnp.abs(F_refit[2, 2]), 1e-12)
    sf_r, inl_f_r = _score_f(F_refit, uv1, uv2, mask, sigma2)
    F_best = jnp.where(sf_r >= SF, F_refit, F_best)
    inl_f = jnp.where(sf_r >= SF, inl_f_r, inl_f)
    SF = jnp.maximum(sf_r, SF)

    wh = inl_h.astype(uv1.dtype)
    H_refit = jnp.linalg.inv(T2) @ _solve_h(n1, n2, wh) @ T1
    H_refit = H_refit / jnp.maximum(jnp.abs(H_refit[2, 2]), 1e-12)
    sh_r, inl_h_r = _score_h(H_refit, uv1, uv2, mask, sigma2)
    H_best = jnp.where(sh_r >= SH, H_refit, H_best)
    inl_h = jnp.where(sh_r >= SH, inl_h_r, inl_h)
    SH = jnp.maximum(sh_r, SH)

    # --- model selection RH > 0.40 -> homography (Initializer.cc:100-122)
    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_h = RH > 0.40

    # --- motion recovery: evaluate both families, pick by vote of chosen model
    Rf, tf = _candidate_motions_from_f(F_best, K)       # [4,...]
    Rh, th = _candidate_motions_from_h(H_best, K)       # [8,...]
    Rs = jnp.where(use_h, Rh, jnp.concatenate([Rf, Rf]))  # pad F-family to 8
    ts_all = jnp.where(use_h, th, jnp.concatenate([tf, tf]))
    vote_mask = jnp.where(use_h, inl_h, inl_f) & mask

    ngood, pts, good, poses2 = _vote_motion(
        Rs, ts_all, uv1, uv2, vote_mask, intr, chi2_th=4.0 * sigma2, sigma2=sigma2
    )
    # The F-family has only 4 distinct motions (padded to 8 by duplication);
    # invalidate the duplicates so the best/second-best dominance test sees
    # each motion once.
    cand_valid = jnp.where(use_h, jnp.ones(8, bool), jnp.arange(8) < 4)
    ngood = jnp.where(cand_valid, ngood, -1)
    best = jnp.argmax(ngood)
    nbest = ngood[best]
    # Acceptance: clear winner with enough support (ReconstructF :538-569 gist:
    # best must dominate, enough triangulated points).
    nsecond = jnp.sort(ngood)[-2]
    n_inl = jnp.sum(vote_mask)
    # Parallax gate (ReconstructF/H parallax>minParallax=1 deg,
    # Initializer.cc:560/:660): a tiny-baseline pair can win the vote with
    # float-marginal triangulations whose map immediately collapses.
    c2 = lie.se3_inverse(poses2[jnp.argmax(ngood)])[4:7]
    pcos = tri.parallax_cos(pts[jnp.argmax(ngood)], jnp.zeros(3), c2)
    g = good[jnp.argmax(ngood)]
    pcos_sorted = jnp.sort(jnp.where(g, pcos, -jnp.inf))
    n_good = jnp.sum(g)
    med_cos = pcos_sorted[
        jnp.clip(pcos_sorted.shape[0] - n_good // 2 - 1, 0,
                 pcos_sorted.shape[0] - 1)
    ]
    enough_parallax = med_cos < jnp.cos(jnp.deg2rad(1.0))
    ok = (nbest >= min_inliers) & (
        nsecond < jnp.maximum(0.75 * nbest, 1.0)
    ) & (nbest >= min_triangulated_ratio * 0.5 * n_inl) & enough_parallax

    pose21 = poses2[best]
    # Normalize translation scale to unit baseline (monocular gauge freedom;
    # the caller re-scales by inverse median depth like Tracking.cc:709-731).
    tnorm = jnp.maximum(jnp.linalg.norm(pose21[4:7]), 1e-12)
    pose21 = pose21.at[4:7].set(pose21[4:7] / tnorm)
    points = pts[best] / tnorm
    points = tri.refine_triangulation(
        points, uv1, uv2, lie.se3_identity(), pose21, intr
    )
    return TwoViewResult(
        ok=ok, pose21=pose21, points=points, inliers=good[best], used_h=use_h
    )
