"""Trajectory writers + ATE evaluation.

Writers mirror the reference's save formats
(``System::SaveTrajectoryTUM/SaveKeyFrameTrajectoryTUM/SaveTrajectoryKITTI``,
reference ``src/System.cc:346-496``).  The evaluator is the capability the
reference lineage used offline (TUM ATE tooling referenced at
``include/System.h:110``) — absolute trajectory error after Horn/Umeyama
alignment with optional scale (monocular).
"""

from __future__ import annotations

import numpy as np


def save_trajectory_tum(path, timestamps, poses_cw):
    """TUM format: ``t tx ty tz qx qy qz qw`` of camera-to-world (Twc)."""
    from orb_slam_free_space_carving_tpu.utils import lie
    import jax.numpy as jnp

    poses_cw = jnp.asarray(poses_cw)
    twc = np.asarray(lie.se3_inverse(poses_cw))
    with open(path, "w") as f:
        for ts, p in zip(timestamps, twc):
            qw, qx, qy, qz, tx, ty, tz = p
            f.write(f"{ts:.6f} {tx:.7f} {ty:.7f} {tz:.7f} {qx:.7f} {qy:.7f} {qz:.7f} {qw:.7f}\n")


def save_trajectory_kitti(path, poses_cw):
    """KITTI format: 12 entries of the 3x4 Twc matrix per line."""
    from orb_slam_free_space_carving_tpu.utils import lie
    import jax.numpy as jnp

    mats = np.asarray(lie.se3_to_matrix(lie.se3_inverse(jnp.asarray(poses_cw))))
    with open(path, "w") as f:
        for m in mats:
            f.write(" ".join(f"{v:.9e}" for v in m[:3].reshape(-1)) + "\n")


def load_trajectory_tum(path):
    """Returns (timestamps[N], positions[N,3], quats_wxyz[N,4]) of Twc."""
    ts, pos, quat = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            pos.append(v[1:4])
            quat.append([v[7], v[4], v[5], v[6]])  # to wxyz
    return np.array(ts), np.array(pos), np.array(quat)


def umeyama_alignment(x, y, with_scale=True):
    """Least-squares similarity aligning x->y (both [N,3]).

    Returns (s, R, t) with y ~ s R x + t.  Umeyama 1991 — the standard ATE
    alignment for monocular (scale-ambiguous) trajectories.
    """
    mx, my = x.mean(0), y.mean(0)
    xc, yc = x - mx, y - my
    cov = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_x = (xc ** 2).sum() / len(x)
    s = float(np.trace(np.diag(D) @ S) / var_x) if with_scale else 1.0
    t = my - s * R @ mx
    return s, R, t


def ate_rmse(est_positions, gt_positions, with_scale=True):
    """Absolute trajectory error RMSE (m) after similarity alignment."""
    est = np.asarray(est_positions, dtype=np.float64)
    gt = np.asarray(gt_positions, dtype=np.float64)
    assert est.shape == gt.shape and est.shape[-1] == 3
    s, R, t = umeyama_alignment(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    err = np.linalg.norm(aligned - gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def associate_by_timestamp(ts_a, ts_b, max_dt=0.02):
    """Greedy nearest-timestamp association (TUM association convention)."""
    ia, ib = [], []
    j = 0
    for i, ta in enumerate(ts_a):
        while j + 1 < len(ts_b) and abs(ts_b[j + 1] - ta) <= abs(ts_b[j] - ta):
            j += 1
        if abs(ts_b[j] - ta) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.array(ia, dtype=np.int64), np.array(ib, dtype=np.int64)
