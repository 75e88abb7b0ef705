"""Incremental re-carving (CarvingConfig.incremental): signed deposits over
persistent vote grids must be exactly equivalent to a from-scratch carve
(reference semantics: incremental tet updates == full recompute,
``FreespaceDelaunayAlgorithm.cc:274-302``)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.ops import carving


def _rand_rays(rng, n, lo=-2.0, hi=2.0):
    o = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    t = rng.uniform(lo, hi, (n, 3)).astype(np.float32)
    return o, t


class TestSignedDeposits:
    def test_add_then_retract_is_identity(self):
        rng = np.random.default_rng(0)
        o, t = _rand_rays(rng, 500)
        lo = jnp.full(3, -2.5)
        hi = jnp.full(3, 2.5)
        mask = jnp.ones(500, bool)
        kw = dict(resolution=64, n_samples=48)
        v1, e1 = carving.carve_votes(jnp.asarray(o), jnp.asarray(t), mask,
                                     lo, hi, weight=1.0, **kw)
        v2, e2 = carving.carve_votes(jnp.asarray(o), jnp.asarray(t), mask,
                                     lo, hi, weight=-1.0, **kw)
        assert float(jnp.abs(v1 + v2).max()) == 0.0
        assert float(jnp.abs(e1 + e2).max()) == 0.0

    def test_delta_equals_full(self):
        """deposit(A) + deposit(B_old) - deposit(B_old) + deposit(B_new)
        == deposit(A + B_new), bit-exactly."""
        rng = np.random.default_rng(1)
        oA, tA = _rand_rays(rng, 700)
        oB, tB = _rand_rays(rng, 300)
        oBn, tBn = _rand_rays(rng, 260)           # B moved + shrank
        lo = jnp.full(3, -2.5)
        hi = jnp.full(3, 2.5)
        kw = dict(resolution=64, n_samples=48)

        def dep(o, t, w):
            return carving.carve_votes(
                jnp.asarray(o), jnp.asarray(t),
                jnp.ones(o.shape[0], bool), lo, hi, weight=w, **kw)

        vF, eF = dep(np.concatenate([oA, oBn]), np.concatenate([tA, tBn]), 1.0)
        vA, eA = dep(oA, tA, 1.0)
        vB, eB = dep(oB, tB, 1.0)
        vBs, eBs = dep(oB, tB, -1.0)
        vBn, eBn = dep(oBn, tBn, 1.0)
        v = vA + vB + vBs + vBn
        e = eA + eB + eBs + eBn
        assert float(jnp.abs(v - vF).max()) == 0.0
        assert float(jnp.abs(e - eF).max()) == 0.0


@pytest.mark.slow
class TestPipelineIncremental:
    def test_incremental_matches_scratch_recarve(self):
        """Run the synthetic pipeline with incremental carving (tol=0 so any
        BA move re-carves its keyframe); at the end the persistent grids must
        EXACTLY equal a from-scratch deposit of the current constraint set
        over the same frozen bounds, and incremental updates must actually
        have happened."""
        import sys

        sys.path.insert(0, "/root/repo")
        from tests.test_pipeline import _cfg
        from orb_slam_free_space_carving_tpu.models.system import System
        from orb_slam_free_space_carving_tpu.utils.synthetic import (
            SyntheticSequence,
        )

        cfg = _cfg()
        cfg = dataclasses.replace(
            cfg,
            carving=dataclasses.replace(
                cfg.carving, incremental=True, incremental_tol_voxels=0.0,
                # tol=0 marks every BA-touched KF changed each mesh, which
                # would always trip the churn trigger -> disable it so the
                # signed-delta path (retract+redeposit) is what runs.
                incremental_churn_frac=2.0,
                grid_resolution=64, ray_samples=48,
            ),
        )
        seq = SyntheticSequence(cfg.camera, n_frames=30)
        sysm = System(cfg)
        for i in range(30):
            ts, img = seq.frame(i)
            sysm.track_monocular(img, ts)
        sysm.shutdown()
        carver = sysm.carver
        assert carver.n_meshes >= 2
        assert carver.n_full_recarves >= 1
        assert carver.n_inc_updates >= 1, "no incremental update ever ran"
        assert carver.vertices is not None and carver.vertices.shape[0] > 50

        # From-scratch deposit of the live constraint set on the same bounds.
        cur = carver._constraints_by_kf()
        all_tg = np.concatenate([v[2] for v in cur.values()])
        all_or = np.concatenate(
            [np.broadcast_to(o, tg.shape) for (o, _p, tg) in cur.values()]
        )
        v_ref, e_ref = carver._deposit(all_or, all_tg, 1.0)
        assert float(jnp.abs(carver._votes - v_ref).max()) == 0.0
        assert float(jnp.abs(carver._evidence - e_ref).max()) == 0.0
