"""Multi-host (multi-process) distribution over DCN + ICI.

The reference is a single-process pthread system (SURVEY.md section 2.4); the
BASELINE adds a genuinely new requirement: >=70% scaling efficiency at 2
hosts.  This module is the multi-controller story:

- :func:`initialize` wraps ``jax.distributed.initialize`` (one JAX process
  per host; devices of all processes form one global platform).
- :func:`global_mesh` builds the 1-D observation mesh over ALL processes'
  devices.  Within a host the reduction rides ICI; across hosts the same
  ``psum`` lowers to a DCN all-reduce — XLA picks the transport, we pick the
  layout (the scaling-book recipe).
- :func:`dist_array` turns per-process observation shards into one global
  sharded array (``jax.make_array_from_process_local_data``).
- :func:`ba_solve_dist` runs the observation-sharded CG-Schur global BA
  (ops/ba.py) with per-observation linearization sharded over every device of
  every host and the tiny reduced camera system replicated.

Tested by ``tests/test_multihost.py``, which launches a real 2-process
``jax.distributed`` cluster on CPU (SURVEY.md section 4's recipe) and asserts
distributed == single-process within tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam_free_space_carving_tpu.ops import ba
from orb_slam_free_space_carving_tpu.utils import lie


def initialize(coordinator_address: str, num_processes: int, process_id: int,
               local_device_count: int | None = None):
    """Join the multi-process cluster (idempotent per process)."""
    kwargs = {}
    if local_device_count is not None:
        kwargs["num_processes"] = num_processes
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis: str = "obs") -> Mesh:
    """1-D mesh over every device of every process, process-major order (so
    contiguous observation shards live on one host and the cross-host hop is
    a single DCN segment of the all-reduce)."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.array(devs), (axis,))


def dist_array(local: np.ndarray, mesh: Mesh, axis: str = "obs"):
    """Per-process local shard [n_local, ...] -> global array [n_global, ...]
    sharded along dim 0 over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, local)


def replicated(x: np.ndarray, mesh: Mesh):
    """Replicate identical host data across all processes."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_callback(
        np.asarray(x).shape, sharding, lambda idx: np.asarray(x)[idx]
    )


def shard_ba_problem_dist(prob_local: ba.BAProblem, mesh: Mesh
                          ) -> ba.BAProblem:
    """Build the global BA problem from a process-local observation shard.

    Camera/point state is identical on every process (replicated); the
    observation arrays are each process's contiguous slice of the global
    observation set.
    """
    rep = lambda x: replicated(np.asarray(x), mesh)
    shd = lambda x: dist_array(np.asarray(x), mesh)
    return ba.BAProblem(
        cam_poses=rep(prob_local.cam_poses),
        cam_free=rep(prob_local.cam_free),
        points=rep(prob_local.points),
        point_valid=rep(prob_local.point_valid),
        obs_cam=shd(prob_local.obs_cam),
        obs_point=shd(prob_local.obs_point),
        obs_uv=shd(prob_local.obs_uv),
        obs_inv_sigma2=shd(prob_local.obs_inv_sigma2),
        obs_mask=shd(prob_local.obs_mask),
        obs_ur=None if prob_local.obs_ur is None
        else shd(prob_local.obs_ur),
    )


@functools.partial(
    jax.jit, static_argnames=("iterations", "cg_iterations", "robust")
)
def _ba_cg_jit(prob, intr, iterations, cg_iterations, robust):
    return ba.ba_solve_cg(
        prob, intr, iterations=iterations, cg_iterations=cg_iterations,
        robust=robust,
    )


def ba_solve_dist(prob_local: ba.BAProblem, intr, mesh: Mesh,
                  iterations: int = 10, cg_iterations: int = 30,
                  robust: bool = True) -> ba.BAResult:
    """Distributed global BA: every process calls this with its observation
    shard; returns replicated results (addressable on every process)."""
    prob = shard_ba_problem_dist(prob_local, mesh)
    return _ba_cg_jit(prob, intr, iterations, cg_iterations, robust)


# ---------------------------------------------------------------------------
# Point-sharded dense-Schur distributed BA: ONE psum per LM iteration.
#
# The observation-sharded CG path above psums the reduced camera system once
# per CG step (~300 small latency-bound collectives per solve) — fine on ICI,
# ruinous across a process/DCN boundary.  The classic distributed-BA layout
# fixes the communication structure instead: shard POINTS, keep every
# observation of a point on the point's shard.  Then the point blocks
# (V, W, Y, back-substitution) are entirely local, the reduced camera system
# S = U - W V^-1 W^T and its rhs are sums of per-shard dense [6C,6C]
# contributions, and each LM iteration needs exactly one all-reduce of
# ~(6C)^2 floats.  The tiny replicated solve runs on every device.
# (The scaling-book recipe: pick the sharding that makes the collective
# volume per step O(model), not O(steps x latency).)
# ---------------------------------------------------------------------------
from jax.experimental.shard_map import shard_map


def partition_by_point(prob: ba.BAProblem, n_shards: int):
    """Reorder+pad observations so shard k's slice references only the
    contiguous point range [k*P/n, (k+1)*P/n).

    Returns a new BAProblem whose obs arrays are [n_shards * O_pad] with
    padded rows masked out, plus the permutation ``order`` mapping new row ->
    original observation row (padded rows = -1).
    """
    P_ = prob.points.shape[0]
    assert P_ % n_shards == 0, (P_, n_shards)
    Pl = P_ // n_shards
    obs_pt = np.asarray(prob.obs_point)
    obs_mask = np.asarray(prob.obs_mask)
    shard_of = np.clip(obs_pt // Pl, 0, n_shards - 1)
    counts = np.bincount(shard_of[obs_mask], minlength=n_shards)
    Opad = max(8, int(-(-counts.max() // 8) * 8))

    order = np.full(n_shards * Opad, -1, np.int64)
    for k in range(n_shards):
        rows = np.where((shard_of == k) & obs_mask)[0]
        order[k * Opad: k * Opad + rows.size] = rows

    def take(x, fill=0):
        x = np.asarray(x)
        out = np.full((order.size,) + x.shape[1:], fill, x.dtype)
        sel = order >= 0
        out[sel] = x[order[sel]]
        return out

    new_pt = take(prob.obs_point)
    # Padded rows must index a point INSIDE their shard (masked anyway).
    shard_idx = np.repeat(np.arange(n_shards), Opad)
    new_pt[order < 0] = (shard_idx * Pl)[order < 0]
    parted = ba.BAProblem(
        cam_poses=np.asarray(prob.cam_poses),
        cam_free=np.asarray(prob.cam_free),
        points=np.asarray(prob.points),
        point_valid=np.asarray(prob.point_valid),
        obs_cam=take(prob.obs_cam),
        obs_point=new_pt,
        obs_uv=take(prob.obs_uv),
        obs_inv_sigma2=take(prob.obs_inv_sigma2),
        obs_mask=take(prob.obs_mask, fill=False) & (order >= 0),
        obs_ur=None if prob.obs_ur is None else take(prob.obs_ur, fill=-1.0),
    )
    return parted, order


def _put_global(x_full: np.ndarray, mesh: Mesh, spec: P):
    """Build a (possibly multi-process) global array from the full host copy
    every process holds.  Sharded dims slice process-contiguously (the mesh
    is process-major)."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(x_full), sharding)
    return jax.make_array_from_callback(
        np.asarray(x_full).shape, sharding,
        lambda idx: np.asarray(x_full)[idx],
    )


_SCHUR_FN_CACHE: dict = {}


def ba_solve_dist_schur(parted: ba.BAProblem, intr, mesh: Mesh,
                        iterations: int = 10, chi2_th: float = 5.991,
                        robust: bool = True, lm_lambda0: float = 1e-4,
                        lm_lambda_factor: float = 2.0) -> ba.BAResult:
    """Distributed dense-Schur LM over a point-sharded problem
    (:func:`partition_by_point` output; every process passes the SAME full
    host arrays).  One ``psum`` of the [6C,6C] reduced system per iteration.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    cam_poses = _put_global(parted.cam_poses, mesh, P())
    cam_free = _put_global(parted.cam_free, mesh, P())
    points = _put_global(parted.points, mesh, P(axis))
    point_valid = _put_global(parted.point_valid, mesh, P(axis))
    obs = [_put_global(np.asarray(x), mesh, P(axis)) for x in (
        parted.obs_cam, parted.obs_point, parted.obs_uv,
        parted.obs_inv_sigma2, parted.obs_mask,
    )]
    intr = _put_global(np.asarray(intr), mesh, P())

    C = parted.cam_poses.shape[0]
    Pl = parted.points.shape[0] // n_dev

    cache_key = (mesh, C, Pl, parted.obs_cam.shape[0], iterations,
                 float(chi2_th), robust, float(lm_lambda0),
                 float(lm_lambda_factor))
    cached = _SCHUR_FN_CACHE.get(cache_key)
    if cached is not None:
        cp, pts, chi2, cost = cached(
            cam_poses, cam_free, intr, points, point_valid, *obs
        )
        return ba.BAResult(cam_poses=cp, points=pts, obs_chi2=chi2,
                           cost=cost)
    jnp_ = jnp

    def shard_fn(cam_poses, cam_free, intr, points_l, pvalid_l,
                 obs_cam, obs_pt, obs_uv, obs_is2, obs_mask):
        sidx = jax.lax.axis_index(axis)
        opt_l = obs_pt - sidx * Pl

        def local_prob(points_l):
            return ba.BAProblem(
                cam_poses=None, cam_free=cam_free, points=points_l,
                point_valid=pvalid_l, obs_cam=obs_cam, obs_point=opt_l,
                obs_uv=obs_uv, obs_inv_sigma2=obs_is2, obs_mask=obs_mask,
            )

        def cost_of(cp, pts):
            pr = local_prob(pts)._replace(cam_poses=cp)
            local = ba._robust_cost(pr, cp, pts, intr, chi2_th)
            return jax.lax.psum(local, axis)

        def lm_iter(_, carry):
            cp, pts, lam, cost = carry
            pr = local_prob(pts)._replace(cam_poses=cp)
            e, Jc, Jp, w, _, _ = ba._linearize(
                pr, cp, pts, intr, chi2_th, robust
            )
            wJc = Jc * w[:, None, None]
            wJp = Jp * w[:, None, None]
            Ublk = jax.ops.segment_sum(
                jnp_.einsum("oij,oik->ojk", wJc, Jc), obs_cam, num_segments=C
            )
            Vblk = jax.ops.segment_sum(
                jnp_.einsum("oij,oik->ojk", wJp, Jp), opt_l, num_segments=Pl
            )
            bc = -jax.ops.segment_sum(
                jnp_.einsum("oij,oi->oj", wJc, e), obs_cam, num_segments=C
            )
            bp = -jax.ops.segment_sum(
                jnp_.einsum("oij,oi->oj", wJp, e), opt_l, num_segments=Pl
            )
            Wblk = jax.ops.segment_sum(
                jnp_.einsum("oij,oik->ojk", wJc, Jp),
                obs_cam * Pl + opt_l, num_segments=C * Pl,
            ).reshape(C, Pl, 6, 3)
            Vinv = ba._inv3x3(Vblk + lam * jnp_.eye(3))
            Wd = Wblk.transpose(0, 2, 1, 3).reshape(C * 6, Pl, 3)
            Y = jnp_.einsum("kpj,pji->kpi", Wd, Vinv)
            S_red = jnp_.einsum("kpi,lpi->kl", Y, Wd)
            Yb = jnp_.einsum("kpi,pi->k", Y, bp)

            # THE one collective of the iteration: all local dense
            # contributions fuse into a single all-reduce.
            Ublk, bc, S_red, Yb = jax.lax.psum((Ublk, bc, S_red, Yb), axis)

            Ud = jnp_.zeros((C, 6, C, 6)).at[
                jnp_.arange(C), :, jnp_.arange(C), :
            ].set(Ublk + lam * jnp_.eye(6)).reshape(C * 6, C * 6)
            S = Ud - S_red
            rhs = bc.reshape(-1) - Yb
            free6 = jnp_.repeat(cam_free, 6)
            S = jnp_.where(free6[:, None] & free6[None, :], S,
                           jnp_.eye(C * 6) * 1.0)
            rhs = jnp_.where(free6, rhs, 0.0)
            dxc = jnp_.linalg.solve(S, rhs).reshape(C, 6)

            WTdx = jnp_.einsum("kpi,k->pi", Wd, dxc.reshape(-1))
            dxp = jnp_.einsum("pij,pj->pi", Vinv, bp - WTdx)
            dxp = dxp * pvalid_l[:, None]

            new_cp = jax.vmap(lie.se3_retract)(cp, dxc * cam_free[:, None])
            new_pts = pts + dxp
            new_cost = cost_of(new_cp, new_pts)
            accept = new_cost < cost
            cp = jnp_.where(accept, new_cp, cp)
            pts = jnp_.where(accept, new_pts, pts)
            lam = jnp_.where(accept, lam / lm_lambda_factor,
                             lam * lm_lambda_factor * lm_lambda_factor)
            lam = jnp_.clip(lam, 1e-9, 1e6)
            cost = jnp_.where(accept, new_cost, cost)
            return cp, pts, lam, cost

        cost0 = cost_of(cam_poses, points_l)
        cp, pts, _, cost = jax.lax.fori_loop(
            0, iterations, lm_iter,
            (cam_poses, points_l, jnp_.float32(lm_lambda0), cost0),
        )
        pr = local_prob(pts)._replace(cam_poses=cp)
        e, xc = ba._obs_residual(pr, cp, pts, intr, 0.0)
        chi2 = jnp_.sum(e * e, axis=-1) * obs_is2
        chi2 = jnp_.where(xc[..., 2] > 0, chi2, jnp_.inf)
        return cp, pts, chi2, cost

    fn = jax.jit(shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis),
                  P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(axis), P()),
        check_rep=False,
    ))
    _SCHUR_FN_CACHE[cache_key] = fn
    cp, pts, chi2, cost = fn(
        cam_poses, cam_free, intr, points, point_valid, *obs
    )
    return ba.BAResult(cam_poses=cp, points=pts, obs_chi2=chi2, cost=cost)


# ---------------------------------------------------------------------------
# Shared fixture problem for the multi-process test (every process must build
# the IDENTICAL global problem; tests/test_multihost.py's single-process
# reference uses the same builder).
# ---------------------------------------------------------------------------
def make_demo_problem(C=6, P=120, noise_px=0.3):
    """Deterministic synthetic bundle, identical on every process."""
    import jax.numpy as jnp

    from orb_slam_free_space_carving_tpu.utils import camera, lie

    intr = np.array([500.0, 500.0, 320.0, 240.0, 0, 0, 0, 0, 0], np.float32)
    rng = np.random.default_rng(0)
    pts_gt = np.stack([
        rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(4, 8, P),
    ], axis=-1).astype(np.float32)
    poses_gt = []
    for i in range(C):
        w = rng.normal(0, 0.02, 3).astype(np.float32)
        q = np.asarray(lie.so3_exp_quat(jnp.asarray(w)))
        poses_gt.append(np.concatenate(
            [q, [0.25 * i, 0.02 * i, 0.01 * i]]).astype(np.float32))
    poses_gt = np.stack(poses_gt)

    obs_cam, obs_pt, obs_uv = [], [], []
    for c in range(C):
        uv = np.asarray(camera.project(
            lie.se3_apply(jnp.asarray(poses_gt[c]), jnp.asarray(pts_gt)),
            jnp.asarray(intr)))
        uv = uv + rng.normal(0, noise_px, uv.shape).astype(np.float32)
        obs_cam.extend([c] * P)
        obs_pt.extend(range(P))
        obs_uv.append(uv)
    obs_uv = np.concatenate(obs_uv).astype(np.float32)
    O = len(obs_cam)

    pose_pert = 0.02 * rng.normal(0, 1, (C, 6)).astype(np.float32)
    pose_pert[:2] = 0.0
    poses0 = np.asarray(jax.vmap(lie.se3_retract)(
        jnp.asarray(poses_gt), jnp.asarray(pose_pert)))
    pts0 = pts_gt + 0.05 * rng.normal(0, 1, (P, 3)).astype(np.float32)

    prob = ba.BAProblem(
        cam_poses=poses0,
        cam_free=np.arange(C) >= 2,
        points=pts0,
        point_valid=np.ones(P, bool),
        obs_cam=np.asarray(obs_cam, np.int32),
        obs_point=np.asarray(obs_pt, np.int32),
        obs_uv=obs_uv,
        obs_inv_sigma2=np.ones(O, np.float32),
        obs_mask=np.ones(O, bool),
    )
    return prob, intr
