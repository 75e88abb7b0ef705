"""Async stage runtime: P1-P5 latency hiding with inline-mode parity.

The reference hides mapping/loop/carving latency behind pthreads
(``src/System.cc:96-119``); here one stage worker owns all map writes
(runtime/pipeline.py).  These tests check (a) the runner primitive, (b) that
the async pipeline tracks the synthetic sequence with quality comparable to
the deterministic inline mode, and (c) shutdown drains the queue.
"""

import dataclasses
import time

import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.runtime.pipeline import StageRunner
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence
from orb_slam_free_space_carving_tpu.utils.trajectory import ate_rmse


class TestStageRunner:
    def test_inline_mode_runs_immediately(self):
        r = StageRunner(deterministic=True)
        out = []
        r.submit(out.append, 1)
        assert out == [1]
        assert r.is_idle()

    def test_async_ordering_and_flush(self):
        r = StageRunner(deterministic=False)
        out = []

        def slow(x):
            time.sleep(0.01)
            out.append(x)

        for i in range(20):
            r.submit(slow, i)
        r.flush()
        assert out == list(range(20))
        assert r.is_idle()
        r.shutdown()

    def test_worker_error_reported_at_flush(self):
        r = StageRunner(deterministic=False)

        def boom():
            raise ValueError("x")

        r.submit(boom)
        with pytest.raises(RuntimeError):
            r.flush()


def _cfg(deterministic: bool) -> SystemConfig:
    return SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
        capacity=CapacityConfig(
            max_keyframes=64, max_points=16384,
            local_ba_window=8, local_ba_fixed=4,
            local_ba_points=4096, local_ba_obs=8192,
            gba_obs=16384,
        ),
        deterministic=deterministic,
    )


@pytest.fixture(scope="module")
def async_run():
    cfg = _cfg(deterministic=False)
    seq = SyntheticSequence(cfg.camera, n_frames=40)
    sysm = System(cfg, enable_carving=True)
    assert not sysm.runner.deterministic
    for ts, img in seq:
        sysm.track_monocular(img, ts)
    sysm.shutdown()
    return cfg, seq, sysm


class TestAsyncPipeline:
    def test_tracks_most_frames(self, async_run):
        _, seq, sysm = async_run
        _, _, states = sysm.frame_trajectory()
        assert (states == trk.OK).sum() >= len(seq) - 6

    def test_ate_comparable_to_inline(self, async_run):
        _, seq, sysm = async_run
        from orb_slam_free_space_carving_tpu.utils import lie
        import jax.numpy as jnp

        ts, poses, states = sysm.frame_trajectory()
        ok = states == trk.OK
        est = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
        gt = seq.gt_positions()[ok]
        ate = ate_rmse(est, gt, with_scale=True)
        # Inline gate is 5 cm (test_pipeline); async tolerates slightly more
        # because mapping results land a few frames late.
        assert ate < 0.08, f"async ATE {ate:.4f} m"

    def test_map_and_mesh_built(self, async_run):
        _, _, sysm = async_run
        # The async pipeline inserts fewer keyframes on a slow (CPU) worker:
        # the c1b policy requires the mapper to be idle, mirroring the
        # reference's AcceptKeyFrames throttling.
        assert int(sysm.map_host.kf_valid.sum()) >= 3
        assert int(sysm.map_host.pt_valid.sum()) >= 300
        assert sysm.carver.vertices is not None and len(sysm.carver.vertices) > 100

    def test_runner_drained_after_shutdown(self, async_run):
        _, _, sysm = async_run
        assert sysm.runner.is_idle()
