"""Real multi-process ``jax.distributed`` test (SURVEY.md section 4 recipe;
VERDICT r2 missing #1).

Launches a 2-process CPU cluster (4 virtual devices each, 8 global) via
subprocesses, runs the distributed observation-sharded global BA, and asserts
the result matches the single-process solve of the same problem.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def dist_result(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("dist"))
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), outdir],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed rc={p.returncode}:\n{out}"
    return outdir


def test_distributed_matches_single_process(dist_result):
    """Distributed (2 processes x 4 devices) GBA == single-process GBA."""
    import jax.numpy as jnp

    from orb_slam_free_space_carving_tpu.ops import ba
    from orb_slam_free_space_carving_tpu.parallel import distributed

    data = np.load(os.path.join(dist_result, "dist_result.npz"))
    prob, intr = distributed.make_demo_problem()
    prob = ba.BAProblem(*[
        None if x is None else jnp.asarray(x) for x in prob
    ])
    res = ba.ba_solve_cg(prob, jnp.asarray(intr), iterations=10,
                         cg_iterations=30)
    ref_poses = np.asarray(res.cam_poses)
    ref_points = np.asarray(res.points)
    assert np.allclose(data["cam_poses"], ref_poses, atol=5e-4), (
        np.abs(data["cam_poses"] - ref_poses).max())
    assert np.allclose(data["points"], ref_points, atol=5e-3), (
        np.abs(data["points"] - ref_points).max())


def test_cluster_metadata(dist_result):
    meta = json.load(open(os.path.join(dist_result, "dist_meta.json")))
    assert meta["n_processes"] == 2
    assert meta["n_devices"] == 8       # 4 virtual CPU devices per process
    assert meta["solve_s"] > 0
