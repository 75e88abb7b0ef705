"""Native map-store (C++ via ctypes) parity tests against numpy reference."""

import numpy as np
import pytest

from orb_slam_free_space_carving_tpu.runtime import mapstore


@pytest.fixture()
def obs(rng=None):
    rng = np.random.default_rng(5)
    K, N, M = 12, 64, 500
    obs = rng.integers(-1, M, (K, N)).astype(np.int32)
    obs[rng.random((K, N)) < 0.5] = -1
    return obs, K, N, M


def test_native_lib_builds():
    assert mapstore._load() is not None, "libmapstore.so failed to build"


def test_covisibility_row_matches_numpy(obs):
    o, K, N, M = obs
    kf_valid = np.ones(K, np.uint8)
    kf_valid[3] = 0
    got = mapstore.covisibility_row(o, kf_valid, M, 2)
    own = o[2][o[2] >= 0]
    mask = np.zeros(M, bool)
    mask[own] = True
    for j in range(K):
        if j == 2 or not kf_valid[j]:
            assert got[j] == 0
        else:
            other = o[j][o[j] >= 0]
            assert got[j] == int(mask[other].sum())


def test_obs_counts_matches_bincount(obs):
    o, K, N, M = obs
    kf_valid = np.ones(K, np.uint8)
    got = mapstore.obs_counts(o, kf_valid, M)
    flat = o[o >= 0]
    want = np.bincount(flat, minlength=M)
    np.testing.assert_array_equal(got, want)


def test_local_point_ids_unique_and_valid(obs):
    o, K, N, M = obs
    pt_valid = np.zeros(M, bool)
    pt_valid[: M // 2] = True
    ids = mapstore.local_point_ids(o, np.array([0, 1, 2], np.int32),
                                   pt_valid, cap=256)
    assert len(set(ids.tolist())) == len(ids)
    assert (ids < M // 2).all()
    want = np.unique(o[:3])
    want = want[(want >= 0) & (want < M // 2)]
    assert set(ids.tolist()) == set(want.tolist())


def test_point_observations(obs):
    o, K, N, M = obs
    pid = int(o[o >= 0][0])
    pairs = mapstore.point_observations(o, pid)
    ks, fs = np.where(o == pid)
    assert set(map(tuple, pairs.tolist())) == set(zip(ks.tolist(), fs.tolist()))


def test_kfs_observing_matches_numpy():
    rng = np.random.default_rng(3)
    K, N, M = 32, 64, 512
    obs = rng.integers(-1, M, size=(K, N)).astype(np.int32)
    kf_valid = rng.random(K) > 0.2
    pids = rng.choice(M, 20, replace=False).astype(np.int32)
    got = mapstore.kfs_observing(obs, kf_valid.astype(np.uint8), pids, M,
                                 cap=K)
    want = np.where(np.isin(obs, pids).any(axis=1) & kf_valid)[0]
    np.testing.assert_array_equal(np.sort(got), want)
