"""MapPoint maintenance: distinctive-descriptor medoid + scale bounds.

Mirrors the reference behaviors:
- ``MapPoint::ComputeDistinctiveDescriptors`` (``src/MapPoint.cc:251-316``):
  the retained descriptor is the observation descriptor with minimum median
  Hamming distance to the others.
- ``MapPoint::UpdateNormalAndDepth`` (``src/MapPoint.cc:339-392``): viewing
  normal = mean of unit camera->point vectors; max/min scale-invariance
  distances from the reference keyframe's observation octave.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_free_space_carving_tpu.config import (
    CapacityConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.utils import lie


def _small_cfg():
    return SystemConfig(
        capacity=CapacityConfig(max_keyframes=8, max_points=64,
                                local_ba_obs=256),
        orb=ORBConfig(n_features=32, n_features_pad=32),
    )


def _hamming(a, b):
    return int(np.unpackbits(a ^ b).sum())


class TestMedoidDescriptor:
    def test_medoid_is_min_median_distance(self):
        """5 observations of one point: descriptor 0 is near 1..3 and far
        from 4; the medoid must be one of the clustered ones with minimum
        median distance — verified against a brute-force reference."""
        cfg = _small_cfg()
        m = ms.empty_map_arrays(cfg)
        rng = np.random.default_rng(1)
        base = rng.integers(0, 256, 32, dtype=np.uint8)
        descs = []
        for flips in (0, 2, 3, 4, 120):
            d = base.copy()
            bits = rng.choice(256, size=flips, replace=False)
            for b in bits:
                d[b // 8] ^= 1 << (b % 8)
            descs.append(d)
        descs = np.stack(descs)

        kf_desc = np.asarray(m.kf_desc).copy()
        obs = np.asarray(m.obs_pt).copy()
        feat_valid = np.asarray(m.kf_feat_valid).copy()
        for k in range(5):
            kf_desc[k, 0] = descs[k]
            obs[k, 0] = 0
            feat_valid[k, 0] = True
        m = m._replace(
            kf_desc=jnp.asarray(kf_desc), obs_pt=jnp.asarray(obs),
            kf_feat_valid=jnp.asarray(feat_valid),
            kf_valid=m.kf_valid.at[:5].set(True),
            pt_valid=m.pt_valid.at[0].set(True),
            pt_xyz=m.pt_xyz.at[0].set(jnp.array([0.0, 0.0, 2.0])),
        )
        m2 = ms.update_point_stats(m, scale_factor=1.2, n_levels=8,
                                   refresh_desc=True)
        got = np.asarray(m2.pt_desc[0])

        # Brute-force medoid (the reference algorithm).
        D = np.array([[_hamming(a, b) for b in descs] for a in descs])
        medians = np.sort(D, axis=1)[:, (len(descs) - 1) // 2]
        best = int(np.argmin(medians))
        assert (got == descs[best]).all()

    def test_no_obs_keeps_descriptor(self):
        cfg = _small_cfg()
        m = ms.empty_map_arrays(cfg)
        d0 = np.arange(32, dtype=np.uint8)
        m = m._replace(
            pt_desc=m.pt_desc.at[0].set(jnp.asarray(d0)),
            pt_valid=m.pt_valid.at[0].set(True),
        )
        m2 = ms.update_point_stats(m, scale_factor=1.2, n_levels=8,
                                   refresh_desc=True)
        assert (np.asarray(m2.pt_desc[0]) == d0).all()


class TestScaleBounds:
    def test_bounds_follow_ref_kf_octave(self):
        """maxDist = dist(ref) * sf^octave, minDist = maxDist / sf^(L-1)
        (MapPoint.cc:372-391)."""
        cfg = _small_cfg()
        m = ms.empty_map_arrays(cfg)
        # KF1 at z offset -1 observes pt0 at z=2 (distance 3) at octave 3.
        pose1 = lie.se3_from_Rt(jnp.eye(3), jnp.array([0.0, 0.0, 1.0]))
        m = m._replace(
            kf_valid=m.kf_valid.at[:2].set(True),
            kf_pose=m.kf_pose.at[1].set(pose1),
            kf_feat_valid=m.kf_feat_valid.at[1, 0].set(True),
            kf_octave=m.kf_octave.at[1, 0].set(3),
            obs_pt=m.obs_pt.at[1, 0].set(0),
            pt_valid=m.pt_valid.at[0].set(True),
            pt_xyz=m.pt_xyz.at[0].set(jnp.array([0.0, 0.0, 2.0])),
            pt_ref_kf=m.pt_ref_kf.at[0].set(1),
        )
        sf, L = 1.2, 8
        m2 = ms.update_point_stats(m, scale_factor=sf, n_levels=L)
        dist = 3.0
        assert np.isclose(float(m2.pt_max_dist[0]), dist * sf**3, rtol=1e-5)
        assert np.isclose(
            float(m2.pt_min_dist[0]), dist * sf**3 / sf ** (L - 1), rtol=1e-5
        )

    def test_bounds_untouched_without_ref_obs(self):
        cfg = _small_cfg()
        m = ms.empty_map_arrays(cfg)
        m = m._replace(
            pt_valid=m.pt_valid.at[0].set(True),
            pt_max_dist=m.pt_max_dist.at[0].set(7.0),
            pt_min_dist=m.pt_min_dist.at[0].set(0.5),
        )
        m2 = ms.update_point_stats(m, scale_factor=1.2, n_levels=8)
        assert float(m2.pt_max_dist[0]) == 7.0
        assert float(m2.pt_min_dist[0]) == 0.5
