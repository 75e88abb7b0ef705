"""Sharded bundle adjustment + carving over a device mesh.

Design (SURVEY.md section 2.4 "New" row): the BA observation set is the big
axis — shard it.  Each device computes Jacobian blocks and partial
``segment_sum`` reductions over its observation shard; the reduced camera
system (a few thousand floats) is small, so XLA's automatic partitioning
inserts one all-reduce per assembly and the dense solve is replicated.  This
is exactly the "annotate shardings, let XLA insert collectives" recipe — no
hand-written collectives needed for the data-parallel reductions.

Same pattern for carving: rays shard across devices, the vote grid reduction
becomes an all-reduce.

``make_mesh`` builds a 1-D "obs" mesh from whatever devices exist (real TPUs
or the virtual CPU mesh used in tests / the driver's dry-run).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from orb_slam_free_space_carving_tpu.ops import ba, carving


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_ba_problem(prob: ba.BAProblem, mesh: Mesh, axis: str = "obs"
                     ) -> ba.BAProblem:
    """Place observation arrays sharded over the mesh; small state replicated."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return ba.BAProblem(
        cam_poses=put(prob.cam_poses, repl),
        cam_free=put(prob.cam_free, repl),
        points=put(prob.points, repl),
        point_valid=put(prob.point_valid, repl),
        obs_cam=put(prob.obs_cam, shard),
        obs_point=put(prob.obs_point, shard),
        obs_uv=put(prob.obs_uv, shard),
        obs_inv_sigma2=put(prob.obs_inv_sigma2, shard),
        obs_mask=put(prob.obs_mask, shard),
        obs_ur=None if prob.obs_ur is None else put(prob.obs_ur, shard),
    )


@functools.partial(
    jax.jit, static_argnames=("iterations", "cg_iterations", "robust")
)
def _ba_cg_jit(prob, intr, iterations, cg_iterations, robust,
               lm_lambda0=1e-4, lm_lambda_factor=2.0):
    return ba.ba_solve_cg(
        prob, intr, iterations=iterations, cg_iterations=cg_iterations,
        robust=robust, lm_lambda0=lm_lambda0,
        lm_lambda_factor=lm_lambda_factor,
    )


def ba_solve_sharded(
    prob: ba.BAProblem,
    intr: jnp.ndarray,
    mesh: Mesh,
    iterations: int = 10,
    cg_iterations: int = 30,
    robust: bool = True,
) -> ba.BAResult:
    """Observation-sharded CG-Schur BA.

    The per-observation linearization runs fully sharded; the ``segment_sum``
    block assemblies reduce across devices (XLA all-reduce over the ``obs``
    axis); the CG iterations on the reduced camera system are replicated
    (tiny).  Scales global BA to the keyframe counts the BASELINE's 2-host
    target needs.
    """
    sharded = shard_ba_problem(prob, mesh)
    with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else _nullctx():
        return _ba_cg_jit(sharded, intr, iterations, cg_iterations, robust)


class _nullctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def carve_sharded(
    ray_origins: jnp.ndarray,
    ray_targets: jnp.ndarray,
    ray_mask: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    mesh: Mesh,
    resolution: int = 128,
    n_samples: int = 96,
):
    """Ray-sharded carving: each device marches its ray shard; the vote grids
    all-reduce.  Rays must be padded to a multiple of the mesh size."""
    shard = NamedSharding(mesh, P("obs"))
    repl = NamedSharding(mesh, P())
    o = jax.device_put(ray_origins, shard)
    t = jax.device_put(ray_targets, shard)
    mk = jax.device_put(ray_mask, shard)
    lo = jax.device_put(lo, repl)
    hi = jax.device_put(hi, repl)
    return carving.carve_votes(
        o, t, mk, lo, hi, resolution=resolution, n_samples=n_samples
    )
