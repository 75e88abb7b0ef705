"""Global bundle adjustment over the full map.

TPU re-design of ``LoopClosing::RunGlobalBundleAdjustment``
(``src/LoopClosing.cc:644-761``) + ``Optimizer::GlobalBundleAdjustemnt``
(``src/Optimizer.cc:41-237``): after a loop closes (or on demand) the entire
map — every valid keyframe and point — is refined jointly.  The reference
solves this with g2o LM on a detached thread, then propagates corrections down
the spanning tree to keyframes created while GBA ran (``:680-706``) and moves
points via their reference keyframe (``:709-749``).

Here the solve is the matrix-free CG-Schur LM (``ops/ba.py:ba_solve_cg``):
camera poses stay a [K,7] block, points a [M,3] block, and observations are
one fixed-capacity [O] row set assembled in a single vectorized pass from the
host observation table.  When more than one device is visible the observation
axis shards across the mesh (``parallel/sharded.py``) — this is the
"async global BA job on spare chips" row of SURVEY.md section 2.4 (P4).

The reference's interruptibility (``mbStopGBA`` + ``mnFullBAIdx`` generation
counter, ``LoopClosing.cc:410-423``) maps to the generation check in
:class:`GlobalBA`: a new loop bumps the generation; a finished solve whose
generation is stale discards its writeback.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import SystemConfig
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.ops import ba
from orb_slam_free_space_carving_tpu.utils import camera, lie


def build_global_problem(cfg: SystemConfig, m: ms.MapArrays,
                         host: Optional[ms.MapHost] = None,
                         fix_kf: Optional[int] = 0,
                         kf_valid: Optional[np.ndarray] = None,
                         obs_pt: Optional[np.ndarray] = None) -> tuple:
    """Assemble the full-map BAProblem from the host observation table.

    Returns (problem, (obs_kf, obs_feat) source indices for outlier erasure).
    Observation rows beyond ``capacity.gba_obs`` are dropped with a warning
    counter (no silent truncation) — the cap is sized to hold every
    observation at the default capacities.

    ``kf_valid``/``obs_pt`` overrides let the detached GBA solve from a host
    SNAPSHOT while mapping keeps mutating the live registry
    (LoopClosing.cc:644-761 runs GBA on its own thread the same way).
    """
    K = cfg.capacity.max_keyframes
    O = cfg.capacity.gba_obs
    if kf_valid is None:
        kf_valid = host.kf_valid[:K]
    if obs_pt is None:
        obs_pt = host.obs_pt[:K]

    rows = obs_pt[:K]                             # [K,N] feature -> point id
    valid_rows = rows >= 0
    valid_rows &= kf_valid[:, None]
    ki, fi = np.where(valid_rows)
    n_obs = ki.size
    dropped = max(0, n_obs - O)
    if dropped:
        ki, fi = ki[:O], fi[:O]
        n_obs = O

    kf_uv, kf_oct, kf_ur = jax.device_get(
        (m.kf_uv, m.kf_octave, m.kf_ur)
    )
    is2_lv = 1.0 / np.array(cfg.orb.level_sigma2, np.float32)

    obs_cam = np.zeros(O, np.int32)
    obs_point = np.zeros(O, np.int32)
    obs_uv = np.zeros((O, 2), np.float32)
    obs_is2 = np.ones(O, np.float32)
    obs_mask = np.zeros(O, bool)
    obs_cam[:n_obs] = ki
    obs_point[:n_obs] = rows[ki, fi]
    obs_uv[:n_obs] = kf_uv[ki, fi]
    obs_is2[:n_obs] = is2_lv[kf_oct[ki, fi].clip(0, len(is2_lv) - 1)]
    obs_mask[:n_obs] = True

    obs_ur = None
    if cfg.sensor != "monocular":
        obs_ur_np = np.full(O, -1.0, np.float32)
        obs_ur_np[:n_obs] = kf_ur[ki, fi]
        obs_ur = jnp.asarray(obs_ur_np)

    cam_free = kf_valid.copy()
    if fix_kf is not None:
        cam_free[fix_kf] = False                  # gauge anchor (Optimizer.cc:91)

    prob = ba.BAProblem(
        cam_poses=m.kf_pose,
        cam_free=jnp.asarray(cam_free),
        points=m.pt_xyz,
        point_valid=m.pt_valid,
        obs_cam=jnp.asarray(obs_cam),
        obs_point=jnp.asarray(obs_point),
        obs_uv=jnp.asarray(obs_uv),
        obs_inv_sigma2=jnp.asarray(obs_is2),
        obs_mask=jnp.asarray(obs_mask),
        obs_ur=obs_ur,
    )
    return prob, (ki, fi, n_obs, dropped)


class GlobalBA:
    """Full-map BA service with the reference's generation-counter semantics."""

    def __init__(self, cfg: SystemConfig):
        self.cfg = cfg
        self.generation = 0          # mnFullBAIdx analog
        self.n_runs = 0
        self.last_cost = None
        self.last_dropped_obs = 0

    def bump(self):
        """A new loop supersedes any conceptual in-flight GBA (:410-423)."""
        self.generation += 1

    def run(self, m: ms.MapArrays, host: ms.MapHost, intr,
            iterations: Optional[int] = None) -> ms.MapArrays:
        """Synchronous solve + writeback (deterministic pipeline path)."""
        snap = self.snapshot(m, host)
        solved = self.solve(snap, intr, iterations)
        if solved is None:
            return m
        out = self.writeback(m, host, solved)
        return m if out is None else out

    # -- detached-GBA building blocks (LoopClosing.cc:644-761 thread P4) ---

    def snapshot(self, m: ms.MapArrays, host: ms.MapHost) -> dict:
        """Freeze the state the solve will run from (worker thread).  ``m``
        is an immutable pytree; only the mutable host tables need copying."""
        K = self.cfg.capacity.max_keyframes
        return {
            "m": m,
            "gen": self.generation,
            "kf_valid": host.kf_valid[:K].copy(),
            "obs_pt": host.obs_pt[:K].copy(),
            "pt_valid": host.pt_valid.copy(),
        }

    def solve(self, snap: dict, intr, iterations: Optional[int] = None):
        """Pure solve from a snapshot (safe on the detached GBA worker).

        Sharded over the observation axis when multiple devices are present
        (the distributed GBA row of SURVEY section 2.4)."""
        it = iterations or self.cfg.optimizer.gba_iterations_loop
        prob, (ki, fi, n_obs, dropped) = build_global_problem(
            self.cfg, snap["m"], kf_valid=snap["kf_valid"],
            obs_pt=snap["obs_pt"],
        )
        self.last_dropped_obs = dropped
        if n_obs < 100:
            return None
        if snap["gen"] != self.generation:
            return None                       # superseded before starting

        if len(jax.devices()) > 1:
            from orb_slam_free_space_carving_tpu.parallel import sharded

            mesh = sharded.make_mesh()
            res = sharded.ba_solve_sharded(prob, intr, mesh, iterations=it)
        else:
            res = _gba_jit(prob, intr, it,
                           lm_lambda0=self.cfg.optimizer.lm_lambda_init,
                           lm_lambda_factor=self.cfg.optimizer.lm_lambda_factor)
        # Materialize on the GBA worker (the expensive sync happens HERE, not
        # on the map worker).
        new_poses, new_pts, cost = jax.device_get(
            (res.cam_poses, res.points, res.cost)
        )
        return {"snap": snap, "poses": new_poses, "points": new_pts,
                "cost": float(cost)}

    def writeback(self, m: ms.MapArrays, host: ms.MapHost, solved: dict
                  ) -> Optional[ms.MapArrays]:
        """Apply a finished solve to the CURRENT map (map-worker thread).

        Keyframes/points created while GBA ran are corrected through the
        spanning tree / their reference keyframe — the reference's
        post-GBA propagation (``LoopClosing.cc:680-749``).  Returns None if
        the solve was superseded by a newer loop (``mnFullBAIdx`` check,
        ``:661``)."""
        snap = solved["snap"]
        if snap["gen"] != self.generation:
            return None                       # superseded: discard
        if not (np.all(np.isfinite(solved["poses"]))
                and np.all(np.isfinite(solved["points"]))):
            # Diverged solve: discard wholesale (the reference's abortable
            # GBA simply skips its writeback, LoopClosing.cc:644-761).
            return None
        self.last_cost = solved["cost"]
        self.n_runs += 1

        K = self.cfg.capacity.max_keyframes
        cur_valid = host.kf_valid[:K]
        snap_valid = snap["kf_valid"]
        cur_poses = np.asarray(m.kf_pose)
        new_poses = cur_poses.copy()
        new_poses[snap_valid] = solved["poses"][snap_valid]

        # Keyframes created during the solve: preserve their relative pose to
        # the (spanning-tree) parent: T_new = (T_cur T_parent_cur^-1) T_parent_new.
        fresh = np.where(cur_valid & ~snap_valid)[0]
        fresh = fresh[np.argsort(host.kf_frame_id[fresh])]
        done = snap_valid.copy()
        for _ in range(3):                    # parent chains resolve in order
            progressed = False
            for k in fresh:
                if done[k]:
                    continue
                p = host.parent[k]
                if p < 0 or not cur_valid[p] or not done[p]:
                    continue
                t_rel = lie.se3_compose(
                    jnp.asarray(cur_poses[k]),
                    lie.se3_inverse(jnp.asarray(cur_poses[p])))
                new_poses[k] = np.asarray(
                    lie.se3_compose(t_rel, jnp.asarray(new_poses[p])))
                done[k] = True
                progressed = True
            if not progressed:
                break

        cur_pt_valid = np.asarray(m.pt_valid)
        new_pts = np.asarray(m.pt_xyz).copy()
        in_gba = snap["pt_valid"] & cur_pt_valid
        new_pts[in_gba] = solved["points"][in_gba]
        # Points created during the solve: correct via their reference KF
        # (x_new = T_ref_new^-1 (T_ref_cur (x))), LoopClosing.cc:709-749.
        fresh_pt = np.where(cur_pt_valid & ~snap["pt_valid"])[0]
        if fresh_pt.size:
            ref = np.asarray(m.pt_ref_kf)[fresh_pt]
            ok = done[ref.clip(0, K - 1)]
            fp = fresh_pt[ok]
            if fp.size:
                refk = ref[ok]
                x_cam = lie.se3_apply(
                    jnp.asarray(cur_poses[refk]), jnp.asarray(new_pts[fp]))
                x_new = lie.se3_apply(
                    jax.vmap(lie.se3_inverse)(jnp.asarray(new_poses[refk])),
                    x_cam)
                new_pts[fp] = np.asarray(x_new)

        m = m._replace(
            kf_pose=jnp.where(jnp.asarray(cur_valid)[:, None],
                              jnp.asarray(new_poses), m.kf_pose),
            pt_xyz=jnp.where(m.pt_valid[:, None],
                             jnp.asarray(new_pts), m.pt_xyz),
        )
        m = ms.update_point_stats(
            m, scale_factor=self.cfg.orb.scale_factor,
            n_levels=self.cfg.orb.n_levels, refresh_desc=True,
            medoid_cap=self.cfg.capacity.max_obs_per_point,
        )

        # CARV adjustment event: every camera + point moved (LoopClosing.cc:735-749).
        kfs = np.where(cur_valid)[0]
        pt_valid = np.asarray(m.pt_valid)
        pids = np.where(pt_valid)[0]
        centers = np.asarray(lie.se3_inverse(m.kf_pose))[:, 4:7]
        host.journal.append(ms.JournalEvent(
            kind="adjust",
            moved_ids=pids, moved_xyz=new_pts[pids],
            moved_kfs=kfs, moved_centers=centers[kfs],
        ))
        host.big_change_idx += 1
        return m


@functools.partial(jax.jit, static_argnames=("iterations",))
def _gba_jit(prob, intr, iterations, lm_lambda0=1e-4,
             lm_lambda_factor=2.0):
    return ba.ba_solve_cg(prob, intr, iterations=iterations, cg_iterations=30,
                          lm_lambda0=lm_lambda0,
                          lm_lambda_factor=lm_lambda_factor)
