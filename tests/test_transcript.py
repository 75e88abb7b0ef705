"""Transcript write -> parse -> replay (VERDICT round-1 item 9).

The reference's transcript is a replayable journal
(``SFMTranscriptInterface_Delaunay::loadTranscriptFromFile`` + ``runFull``,
``SFMTranscriptInterface_Delaunay.cpp:161-228``).  These tests cover the
loader half: the dialect round-trips through parse, deletion/move semantics
apply, and a full pipeline journal replays to the same mesh the live carver
produced — the event-sourced checkpoint story end to end.
"""

import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.models import map_state as ms
from orb_slam_free_space_carving_tpu.models import transcript

from test_pipeline import tracked_system  # noqa: F401  (module fixture)


def _ev(**kw):
    return ms.JournalEvent(**kw)


class TestDialectRoundTrip:
    def test_parse_inverts_write(self, tmp_path):
        journal = [
            _ev(kind="keyframe", kf=3, cam_center=np.array([0.0, 0.5, -1.0]),
                new_points=np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]),
                new_point_ids=np.array([0, 1]),
                vis_ids=np.array([0, 1])),
            _ev(kind="keyframe", kf=7, cam_center=np.array([0.1, 0.5, -1.0]),
                new_points=np.array([[7.0, 8.0, 9.0]]),
                new_point_ids=np.array([2]),
                vis_ids=np.array([0, 1, 2])),
            _ev(kind="del_obs", kf=3, point_id=1),
            _ev(kind="del_point", point_id=0),
            _ev(kind="adjust",
                moved_ids=np.array([2]), moved_xyz=np.array([[7.5, 8.5, 9.5]]),
                moved_kfs=np.array([7]),
                moved_centers=np.array([[0.2, 0.5, -1.0]])),
        ]
        path = tmp_path / "t.txt"
        transcript.write_transcript(journal, str(path))
        st = transcript.parse_transcript(str(path))

        assert len(st.cam_centers) == 2
        # move cam applied (kf slot 7 -> transcript cam index 1)
        np.testing.assert_allclose(st.cam_centers[1], [0.2, 0.5, -1.0],
                                   atol=1e-5)
        # move point applied
        np.testing.assert_allclose(st.points[2], [7.5, 8.5, 9.5], atol=1e-5)
        # del point 0 recorded; del obs (cam0, pid1) removed
        assert 0 in st.deleted_points
        assert (0, 1) not in st.vis
        assert (1, 1) in st.vis

        o, t = st.constraints()
        # Active rays: cam0 sees nothing valid (pid0 deleted, pid1 obs del'd),
        # cam1 sees pid1 and pid2 (pid0 deleted).
        assert o.shape[0] == 2
        np.testing.assert_allclose(t[0], [4.0, 5.0, 6.0], atol=1e-5)
        np.testing.assert_allclose(t[1], [7.5, 8.5, 9.5], atol=1e-5)

    def test_reset_clears(self, tmp_path):
        journal = [
            _ev(kind="keyframe", kf=0, cam_center=np.zeros(3),
                new_points=np.array([[1.0, 1.0, 1.0]]),
                new_point_ids=np.array([0]), vis_ids=np.array([0])),
            _ev(kind="reset"),
            _ev(kind="keyframe", kf=1, cam_center=np.ones(3),
                new_points=np.array([[2.0, 2.0, 2.0]]),
                new_point_ids=np.array([5]), vis_ids=np.array([5])),
        ]
        path = tmp_path / "t.txt"
        transcript.write_transcript(journal, str(path))
        st = transcript.parse_transcript(str(path))
        assert st.n_resets == 1
        assert len(st.cam_centers) == 1
        assert list(st.points) == [5]


class TestReplayMatchesLiveMesh:
    def test_full_pipeline_journal_replays_to_same_mesh(
            self, tracked_system, tmp_path):
        """Write the live run's journal, load it back, carve — the replayed
        mesh must agree with the final live mesh (same constraint set by
        construction; this also audits journal completeness: any unjournaled
        map mutation would surface as a mesh mismatch)."""
        cfg, seq, sysm = tracked_system
        path = tmp_path / "sfm.txt"
        sysm.carver.write_transcript(str(path))

        st = transcript.parse_transcript(str(path))
        assert len(st.cam_centers) >= 2
        v, f = transcript.replay_mesh(st, cfg.carving)
        assert v.shape[0] > 100

        live_v = sysm.carver.vertices
        assert live_v is not None and live_v.shape[0] > 100

        # Chamfer-style agreement between replayed and live vertex sets.
        def chamfer(a, b):
            d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
            return max(d.min(axis=1).mean(), d.min(axis=0).mean())

        sel_a = v[:: max(1, len(v) // 500)]
        sel_b = live_v[:: max(1, len(live_v) // 500)]
        voxel = 2.0 * 4.0 / cfg.carving.grid_resolution  # ~scene extent/R
        assert chamfer(sel_a, sel_b) < 2.0 * voxel
