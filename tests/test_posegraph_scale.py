"""Essential-graph scaling: matrix-free CG solver vs the dense small-graph
solver, and a 1000+-node loop correction (VERDICT r2 weak #7 / do #6).

Reference: ``Optimizer::OptimizeEssentialGraph`` (src/Optimizer.cc:794-1057)
runs on KITTI-00-scale graphs (thousands of keyframes) through g2o's sparse
Cholesky; the TPU CG variant must handle the same scale.
"""

import time

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.ops import posegraph
from orb_slam_free_space_carving_tpu.utils import lie


def _circle_graph(K, drift_per_step=0.002, seed=0):
    """K keyframes around a circle with accumulated odometry drift; edges =
    sequential odometry + one loop edge (last -> first) with the TRUE
    relative transform."""
    rng = np.random.default_rng(seed)
    # Ground-truth poses: evenly spaced on a circle, camera facing tangent.
    sims_gt = []
    for k in range(K):
        ang = 2 * np.pi * k / K
        q = np.array([np.cos(ang / 2), 0.0, np.sin(ang / 2), 0.0], np.float32)
        t = np.array([np.sin(ang), 0.0, 1.0 - np.cos(ang)], np.float32)
        sims_gt.append(np.concatenate([q, t, [1.0]]).astype(np.float32))
    sims_gt = jnp.asarray(np.stack(sims_gt))

    # True sequential relatives.
    rel_fn = jax.vmap(lambda a, b: lie.sim3_compose(a, lie.sim3_inverse(b)))
    rel_true = rel_fn(sims_gt[1:], sims_gt[:-1])        # S_{k+1} S_k^-1

    # Drifted initial estimate: integrate noisy relatives.
    est = [np.asarray(sims_gt[0])]
    for k in range(K - 1):
        noise = np.concatenate([
            rng.normal(0, drift_per_step, 3),          # rot
            rng.normal(0, drift_per_step, 3),          # trans
            [rng.normal(0, drift_per_step * 0.1)],     # log-scale
        ]).astype(np.float32)
        stepped = lie.sim3_retract(
            jnp.asarray(np.asarray(rel_true[k])), jnp.asarray(noise))
        est.append(np.asarray(lie.sim3_compose(stepped, jnp.asarray(est[-1]))))
    sims0 = jnp.asarray(np.stack(est))

    # Edges: sequential (measured = drifted relatives actually integrated,
    # here we use the TRUE relatives as measurements like the reference's
    # essential graph does for non-loop edges) + the loop edge.
    ei = list(range(1, K)) + [K - 1]
    ej = list(range(0, K - 1)) + [0]
    rel_meas = jnp.concatenate([
        rel_true,
        rel_fn(sims_gt[K - 1:K], sims_gt[0:1]),
    ])
    E = len(ei)
    CAP = 1 << int(np.ceil(np.log2(E)))
    ei_p = np.zeros(CAP, np.int32)
    ej_p = np.zeros(CAP, np.int32)
    mask = np.zeros(CAP, bool)
    ei_p[:E] = ei
    ej_p[:E] = ej
    mask[:E] = True
    rel_p = jnp.concatenate([rel_meas, lie.sim3_identity((CAP - E,))])
    fixed = np.zeros(K, bool)
    fixed[0] = True
    return (sims0, jnp.asarray(ei_p), jnp.asarray(ej_p), rel_p,
            jnp.asarray(mask), jnp.asarray(fixed), sims_gt)


import jax  # noqa: E402


def _pose_err(sims, sims_gt):
    return float(jnp.linalg.norm(sims[:, 4:7] - sims_gt[:, 4:7], axis=-1).max())


class TestCGMatchesDense:
    def test_small_graph_parity(self):
        args = _circle_graph(48)
        sims0, ei, ej, rel, mask, fixed, gt = args
        dense = posegraph.optimize_essential_graph(
            sims0, ei, ej, rel, mask, fixed, iterations=15)
        cg = posegraph.optimize_essential_graph_cg(
            sims0, ei, ej, rel, mask, fixed, iterations=15)
        # Both reach the ground truth; allow solver-path differences.
        assert _pose_err(dense, gt) < 5e-3
        assert _pose_err(cg, gt) < 5e-3


class TestLargeGraph:
    def test_1024_nodes_converges_fast(self):
        K = 1024
        sims0, ei, ej, rel, mask, fixed, gt = _circle_graph(K)
        err0 = _pose_err(sims0, gt)
        # Information must propagate around the 1024-cycle: the CG budget
        # scales with graph diameter (loop_closing passes K//8 the same way).
        t0 = time.perf_counter()
        out = posegraph.optimize_essential_graph_cg(
            sims0, ei, ej, rel, mask, fixed, iterations=20,
            cg_iterations=160)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = posegraph.optimize_essential_graph_cg(
            sims0, ei, ej, rel, mask, fixed, iterations=20,
            cg_iterations=160)
        jax.block_until_ready(out)
        run_s = time.perf_counter() - t0
        err1 = _pose_err(out, gt)
        # Loop closure distributes the drift: order-of-magnitude improvement.
        assert err1 < 0.2 * err0, (err0, err1)
        # And it runs in seconds, not minutes (dense would be [7168,7168]).
        assert run_s < 60.0, run_s
