"""Tracking-mode semantics: localization-only mode and early-lost reset.

Reference behavior under test:
- localization-only (``System.cc:293-303`` + ``Tracking.cc:986-991``): the
  tracker keeps localizing but NeedNewKeyFrame always returns false — zero
  keyframes/points are added while the mode is active.
- early-lost auto-reset (``Tracking.cc:480-489``): losing the camera with
  <=5 keyframes (right after initialization) triggers a full System reset so
  the next frames re-initialize instead of relocalizing against a bad map.
"""

import numpy as np

from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

from tests.test_pipeline import _cfg


class TestLocalizationOnly:
    def test_no_keyframes_in_localization_mode(self):
        cfg = _cfg()
        seq = SyntheticSequence(cfg.camera, n_frames=40)
        s = System(cfg, enable_carving=False)
        for i in range(25):
            ts, img = seq.frame(i)
            s.track_monocular(img, ts)
        assert s.get_tracking_state() == trk.OK

        s.activate_localization_mode()
        kf0 = int(s.map_host.kf_valid.sum())
        pt0 = int(s.map_host.pt_valid.sum())
        ok = 0
        for i in range(25, 40):
            ts, img = seq.frame(i)
            s.track_monocular(img, ts)
            ok += s.get_tracking_state() == trk.OK
        s.shutdown()
        # Tracking continues but the map is frozen.
        assert ok >= 12
        assert int(s.map_host.kf_valid.sum()) == kf0
        assert int(s.map_host.pt_valid.sum()) == pt0

    def test_deactivate_resumes_mapping(self):
        cfg = _cfg()
        seq = SyntheticSequence(cfg.camera, n_frames=40)
        s = System(cfg, enable_carving=False)
        for i in range(10):
            ts, img = seq.frame(i)
            s.track_monocular(img, ts)
        s.activate_localization_mode()
        assert s.tracker.only_tracking
        s.deactivate_localization_mode()
        assert not s.tracker.only_tracking
        kf0 = int(s.map_host.kf_valid.sum())
        for i in range(10, 40):
            ts, img = seq.frame(i)
            s.track_monocular(img, ts)
        s.shutdown()
        assert int(s.map_host.kf_valid.sum()) > kf0


class TestEarlyLostReset:
    def test_poisoned_init_self_resets_and_reinitializes(self):
        cfg = _cfg()
        seq = SyntheticSequence(cfg.camera, n_frames=40)
        s = System(cfg, enable_carving=False)
        # Initialize (2 keyframes), then immediately kidnap with blank
        # frames: the reference resets when lost with <=5 KFs.
        for i in range(4):
            ts, img = seq.frame(i)
            s.track_monocular(img, ts)
        assert s.get_tracking_state() == trk.OK
        assert int(s.map_host.kf_valid.sum()) <= 5

        blank = np.zeros((cfg.camera.height, cfg.camera.width), np.uint8)
        for i in range(3):
            s.track_monocular(blank, 100.0 + i)
        # Reset fired: map wiped, back to (re)initialization.
        assert s.get_tracking_state() in (trk.NO_IMAGES_YET, trk.NOT_INITIALIZED)
        assert int(s.map_host.kf_valid.sum()) == 0

        # Re-feed good frames: the system re-initializes from scratch.
        for i in range(8):
            ts, img = seq.frame(i)
            s.track_monocular(img, 200.0 + ts)
        s.shutdown()
        assert s.get_tracking_state() == trk.OK
        assert int(s.map_host.kf_valid.sum()) >= 2


class TestNeighborBucketConfig:
    def test_triangulation_bucket_follows_config(self, monkeypatch):
        """The static neighbor bucket must honor
        cfg.mapping.triangulation_neighbors (LocalMapping.cc:250 uses 20) —
        regression for a silent NB=8 truncation."""
        from orb_slam_free_space_carving_tpu.models import local_mapping as lm

        cfg = _cfg()
        seq = SyntheticSequence(cfg.camera, n_frames=40)
        s = System(cfg, enable_carving=False)

        seen_nb = []
        orig = lm._create_points_fused

        def spy(m, kf, nbp, nb_mask, *args, **kw):
            seen_nb.append(int(nbp.shape[0]))
            return orig(m, kf, nbp, nb_mask, *args, **kw)

        monkeypatch.setattr(lm, "_create_points_fused", spy)
        for ts, img in seq:
            s.track_monocular(img, ts)
        s.shutdown()
        assert seen_nb, "no triangulation batches ran"
        assert max(seen_nb) == cfg.mapping.triangulation_neighbors
