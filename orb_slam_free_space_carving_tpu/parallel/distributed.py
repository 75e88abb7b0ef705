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
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam_free_space_carving_tpu.ops import ba


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
