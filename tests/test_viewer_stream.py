"""Viewer drawers + pose/mesh streaming + live monitor (SURVEY items 17-19,
27, 35; reference Viewer.cc / FrameDrawer.cc / MapDrawer.cc / ModelDrawer.cc
/ ros_mono.cc)."""

import json
import socket

import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.models.viewer import (
    FrameDrawer, MapDrawer, ModelDrawer,
)
from orb_slam_free_space_carving_tpu.runtime.streaming import (
    StreamHub, TcpPublisher,
)
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence


class TestDrawers:
    def test_frame_drawer_overlay(self):
        fd = FrameDrawer()
        img = np.zeros((120, 160), np.uint8)
        uv = np.array([[40.0, 30.0], [100.0, 90.0], [10.0, 10.0]], np.float32)
        valid = np.array([True, True, True])
        track_pt = np.array([5, -1, 9])
        fd.update(img, uv, valid, track_pt, trk.OK)
        out = fd.draw()
        assert out.shape == (128, 160, 3)
        assert fd.n_tracked == 2 and fd.n_features == 3
        # Tracked marker green at (40,30)+bar offset; untracked blue.
        assert out[30 + 8 - 2, 40 - 2, 1] > 150         # green channel
        assert out[90 + 8 - 2, 100 - 2, 2] > 150        # blue channel
        assert fd.state_text == "SLAM MODE"

    def test_map_drawer(self):
        md = MapDrawer(size=128)
        pts = np.random.default_rng(0).uniform(-2, 2, (200, 3)).astype(np.float32)
        kf_centers = np.array([[0.0, 0, 0], [1.0, 0, 1.0]], np.float32)
        img = md.draw(pts, np.ones(200, bool), kf_centers,
                      np.ones(2, bool), cur_center=np.zeros(3),
                      parent=np.array([-1, 0]))
        assert img.shape == (128, 128, 3)
        assert (img.reshape(-1, 3) != np.array([16, 16, 16])).any()

    def test_model_drawer_double_buffer(self):
        mdl = ModelDrawer()
        assert mdl.get_model() is None
        v = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        f = np.array([[0, 1, 2]])
        mdl.set_model(v, f)
        got_v, got_f = mdl.get_model()
        np.testing.assert_allclose(got_v, v)
        assert mdl.version == 1
        mdl.set_model(v * 2, f)
        assert mdl.version == 2
        img = mdl.draw(size=64)
        assert img.shape == (64, 64, 3)


class TestStreaming:
    def test_hub_pub_sub(self):
        hub = StreamHub()
        got = []
        hub.subscribe("pose", got.append)
        assert hub.has_subscribers("pose") and not hub.has_subscribers("mesh")
        hub.publish_pose(1.5, np.zeros(7, np.float32), trk.OK)
        hub.publish_mesh(np.zeros((3, 3)), np.zeros((1, 3), np.int64), 1)
        assert len(got) == 1 and got[0]["t"] == 1.5

    def test_tcp_publisher_roundtrip(self):
        hub = StreamHub()
        pub = TcpPublisher(hub, port=0, topics=("pose",))
        try:
            cli = socket.create_connection(("127.0.0.1", pub.port), timeout=5)
            # Wait for the server to register the client.
            for _ in range(100):
                if pub.n_clients():
                    break
                import time

                time.sleep(0.01)
            hub.publish_pose(2.0, np.arange(7, dtype=np.float32), trk.OK)
            line = cli.makefile().readline()
            msg = json.loads(line)
            assert msg["topic"] == "pose"
            assert msg["data"]["pose"][3] == 3.0
            cli.close()
        finally:
            pub.close()


@pytest.mark.slow
class TestLiveSystem:
    def test_viewer_and_stream_on_pipeline(self, tmp_path):
        """End-to-end smoke: run the synthetic pipeline with the viewer on and
        a pose/mesh subscriber attached; every surface produces output."""
        import sys

        sys.path.insert(0, "/root/repo")
        from tests.test_pipeline import _cfg

        cfg = _cfg()
        seq = SyntheticSequence(cfg.camera, n_frames=26)
        sysm = System(cfg, use_viewer=True)
        poses, meshes = [], []
        sysm.stream.subscribe("pose", poses.append)
        sysm.stream.subscribe("mesh", meshes.append)
        for i in range(26):
            ts, img = seq.frame(i)
            sysm.track_monocular(img, ts)
        out = sysm.viewer.render_once()
        status = sysm.monitor.sample()
        sysm.shutdown()

        assert len(poses) == 26
        assert sysm.get_tracking_state() == trk.OK
        assert "frame" in out and "map" in out and "model" in out
        assert out["map"].ndim == 3
        assert status["n_keyframes"] >= 2
        assert status["n_points"] > 50
        assert "stage_times" in status
        if meshes:                         # mesh cadence dependent
            assert meshes[-1]["n_vertices"] > 0
        assert sysm.viewer.frame_drawer.n_features > 0
