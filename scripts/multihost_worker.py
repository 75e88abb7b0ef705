"""Worker for the 2-process jax.distributed multi-host test.

Usage: python scripts/multihost_worker.py <process_id> <num_processes> <port>
       <outdir>

Each process gets 4 virtual CPU devices (8 global over 2 processes), joins
the cluster, builds the SAME synthetic global BA problem from a fixed seed,
slices its observation shard, and runs the distributed CG-Schur global BA
(parallel/distributed.py).  Process 0 writes the solution + wall time.

This is SURVEY.md section 4's multi-host recipe: real ``jax.distributed``
process boundaries, no TPU pod needed.
"""

import json
import os
import sys
import time

proc_id = int(sys.argv[1])
n_procs = int(sys.argv[2])
port = int(sys.argv[3])
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
# Do not register the axon TPU tunnel in workers.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=n_procs,
    process_id=proc_id,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from orb_slam_free_space_carving_tpu.ops import ba  # noqa: E402
from orb_slam_free_space_carving_tpu.parallel import distributed  # noqa: E402


def make_problem():
    prob, intr = distributed.make_demo_problem()
    return prob, jnp.asarray(intr)


def main():
    prob, intr = make_problem()
    O = prob.obs_cam.shape[0]
    assert O % n_procs == 0
    lo = proc_id * (O // n_procs)
    hi = lo + O // n_procs
    local = ba.BAProblem(
        cam_poses=prob.cam_poses, cam_free=prob.cam_free,
        points=prob.points, point_valid=prob.point_valid,
        obs_cam=prob.obs_cam[lo:hi], obs_point=prob.obs_point[lo:hi],
        obs_uv=prob.obs_uv[lo:hi], obs_inv_sigma2=prob.obs_inv_sigma2[lo:hi],
        obs_mask=prob.obs_mask[lo:hi],
    )

    mesh = distributed.global_mesh()
    n_dev = len(jax.devices())

    res = distributed.ba_solve_dist(local, intr, mesh, iterations=10)
    jax.block_until_ready(res.cam_poses)
    t0 = time.perf_counter()
    res = distributed.ba_solve_dist(local, intr, mesh, iterations=10)
    jax.block_until_ready(res.cam_poses)
    dt = time.perf_counter() - t0

    # Bench-scale problem for the scaling-efficiency artifact (BASELINE
    # line 3: >=70% at 2 hosts).  Same fixed seed on every process; each
    # takes its contiguous observation shard.  Warm solve first (compile),
    # then the timed solve.
    # Point-sharded dense-Schur (ONE psum per LM iteration — the layout that
    # survives a DCN boundary; parallel/distributed.py).
    probB, intrB = distributed.make_demo_problem(C=64, P=4096)
    OB = probB.obs_cam.shape[0]
    partedB, _ = distributed.partition_by_point(probB, len(jax.devices()))
    # Measurement hygiene (VERDICT r4 weak #5): 2 warm solves (compile +
    # cache warm), then 5 timed steady-state solves; report the MEDIAN so
    # one scheduler hiccup cannot fake super- or sub-linear scaling.
    for _ in range(2):
        resB = distributed.ba_solve_dist_schur(partedB, intrB, mesh,
                                               iterations=10)
        jax.block_until_ready(resB.cam_poses)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        resB = distributed.ba_solve_dist_schur(partedB, intrB, mesh,
                                               iterations=10)
        jax.block_until_ready(resB.cam_poses)
        times.append(time.perf_counter() - t0)
    dtB = float(np.median(times))

    if proc_id == 0:
        np.savez(os.path.join(outdir, "dist_result.npz"),
                 cam_poses=np.asarray(res.cam_poses),
                 points=np.asarray(res.points))
        with open(os.path.join(outdir, "dist_meta.json"), "w") as f:
            json.dump({"n_devices": n_dev, "n_processes": n_procs,
                       "solve_s": dt, "solve_bench_s": dtB,
                       "solve_bench_all_s": times,
                       "bench_obs": int(OB)}, f)
    # All processes must stay alive until proc 0 reads the replicated
    # output (collectives involved in np.asarray of sharded results).
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
