"""Tracking robustness under photometric degradation.

VERDICT r3 weak #8: the clean-texture synthetic gates are best cases; real
sequences (fr1/desk) carry sensor noise, auto-exposure drift, motion blur
and vignetting.  No real dataset exists in this environment, so the honest
proxy is the Degrade stack (utils/synthetic.py) on the standard orbit —
deterministic per (seed, frame).
"""

import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.utils.synthetic import (
    Degrade, SyntheticSequence,
)
from orb_slam_free_space_carving_tpu.utils.trajectory import ate_rmse

from tests.test_pipeline import _cfg


@pytest.fixture(scope="module")
def degraded_run():
    cfg = _cfg()
    seq = SyntheticSequence(
        cfg.camera, n_frames=40,
        degrade=Degrade(noise_sigma=5.0, exposure_amp=0.3, blur_px=1,
                        vignette=0.2),
    )
    sysm = System(cfg, enable_carving=False)
    for ts, img in seq:
        sysm.track_monocular(img, ts)
    sysm.shutdown()
    return cfg, seq, sysm


class TestDegradedTracking:
    def test_tracks_most_frames(self, degraded_run):
        _, seq, sysm = degraded_run
        _, _, states = sysm.frame_trajectory()
        assert (states == trk.OK).sum() >= len(seq) - 8

    def test_ate_degraded(self, degraded_run):
        """Clean gate is 5 cm (test_pipeline); degraded tolerates 10 cm —
        fr1/desk-class difficulty, not a different order of magnitude."""
        import jax.numpy as jnp

        from orb_slam_free_space_carving_tpu.utils import lie

        _, seq, sysm = degraded_run
        ts, poses, states = sysm.frame_trajectory()
        ok = states == trk.OK
        est = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
        gt = seq.gt_positions()[ok]
        ate = ate_rmse(est, gt, with_scale=True)
        assert ate < 0.10, f"degraded ATE {ate:.4f} m"

    def test_map_built(self, degraded_run):
        _, _, sysm = degraded_run
        assert int(sysm.map_host.kf_valid.sum()) >= 3
        assert int(sysm.map_host.pt_valid.sum()) >= 200
