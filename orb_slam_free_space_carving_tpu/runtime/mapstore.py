"""ctypes bindings for the native map-structure store (mapstore.cpp).

Builds the shared library on first import if needed (g++ is in the image);
falls back to numpy implementations when compilation is unavailable, so the
package never hard-requires the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_LIB_PATH = os.path.join(_DIR, "libmapstore.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libmapstore.so"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.covisibility_row.argtypes = [
        c_i32p, c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, c_i32p,
    ]
    lib.obs_counts.argtypes = [
        c_i32p, c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, c_i32p,
    ]
    lib.local_point_ids.argtypes = [
        c_i32p, ctypes.c_int64, ctypes.c_int64, c_i32p, ctypes.c_int64,
        c_u8p, c_i32p, ctypes.c_int64,
    ]
    lib.local_point_ids.restype = ctypes.c_int64
    lib.point_observations.argtypes = [
        c_i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, c_i32p,
        ctypes.c_int64,
    ]
    lib.point_observations.restype = ctypes.c_int64
    for fname in ("kfs_observing", "kfs_observing_top"):
        if hasattr(lib, fname):
            fn = getattr(lib, fname)
            fn.argtypes = [
                c_i32p, c_u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                c_i32p, ctypes.c_int64, c_i32p, ctypes.c_int64,
            ]
            fn.restype = ctypes.c_int64
    _lib = lib
    return lib


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def covisibility_row(obs: np.ndarray, kf_valid: np.ndarray, M: int, kf: int
                     ) -> np.ndarray:
    """Shared-point counts of `kf` vs every keyframe (native if available)."""
    K, N = obs.shape
    lib = _load()
    if lib is None:
        own = obs[kf]
        own_pts = own[own >= 0]
        mask = np.zeros(M, bool)
        mask[own_pts] = True
        out = np.zeros(K, np.int32)
        for j in range(K):
            if j == kf or not kf_valid[j]:
                continue
            other = obs[j]
            o = other[other >= 0]
            out[j] = int(mask[o].sum())
        return out
    obs = np.ascontiguousarray(obs, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    out = np.zeros(K, np.int32)
    lib.covisibility_row(_i32p(obs), _u8p(kv), K, N, M, kf, _i32p(out))
    return out


def obs_counts(obs: np.ndarray, kf_valid: np.ndarray, M: int) -> np.ndarray:
    K, N = obs.shape
    lib = _load()
    if lib is None:
        sub = obs[kf_valid[:K].astype(bool)] if K else obs
        flat = sub[sub >= 0]
        return np.bincount(flat, minlength=M).astype(np.int32)
    obs = np.ascontiguousarray(obs, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    out = np.zeros(M, np.int32)
    lib.obs_counts(_i32p(obs), _u8p(kv), K, N, M, _i32p(out))
    return out


def local_point_ids(obs: np.ndarray, kfs: np.ndarray, pt_valid: np.ndarray,
                    cap: int) -> np.ndarray:
    K, N = obs.shape
    M = pt_valid.shape[0]
    lib = _load()
    if lib is None:
        ids = np.unique(obs[kfs])
        ids = ids[ids >= 0]
        ids = ids[pt_valid[ids]]
        return ids[:cap].astype(np.int32)
    obs = np.ascontiguousarray(obs, np.int32)
    kfs = np.ascontiguousarray(kfs, np.int32)
    pv = np.ascontiguousarray(pt_valid, np.uint8)
    out = np.zeros(cap, np.int32)
    n = lib.local_point_ids(_i32p(obs), N, M, _i32p(kfs), len(kfs), _u8p(pv),
                            _i32p(out), cap)
    return out[:n]


def kfs_observing(obs: np.ndarray, kf_valid: np.ndarray, pids: np.ndarray,
                  M: int, cap: int = 256) -> np.ndarray:
    """Keyframe slots observing `pids`, ranked by shared-observation count
    (UpdateLocalKeyFrames keeps the keyframes sharing the MOST points,
    reference src/Tracking.cc:1255-1348); native counting scan, numpy
    fallback."""
    K, N = obs.shape
    lib = _load()
    if lib is None or not hasattr(lib, "kfs_observing_top"):
        counts = (np.isin(obs, pids).sum(axis=1)
                  * kf_valid[:K].astype(np.int64))
        order = np.argsort(-counts, kind="stable")
        order = order[counts[order] > 0]
        return order.astype(np.int32)[:cap]
    obs = np.ascontiguousarray(obs, np.int32)
    kv = np.ascontiguousarray(kf_valid, np.uint8)
    pids = np.ascontiguousarray(pids, np.int32)
    out = np.zeros(cap, np.int32)
    n = lib.kfs_observing_top(_i32p(obs), _u8p(kv), K, N, M, _i32p(pids),
                              len(pids), _i32p(out), cap)
    return out[:n]


def point_observations(obs: np.ndarray, pid: int, cap: int = 256) -> np.ndarray:
    """[(kf, feat)] pairs observing pid, shape [n,2]."""
    K, N = obs.shape
    lib = _load()
    if lib is None:
        ks, fs = np.where(obs == pid)
        return np.stack([ks, fs], -1).astype(np.int32)[:cap]
    obs = np.ascontiguousarray(obs, np.int32)
    out = np.zeros((cap, 2), np.int32)
    n = lib.point_observations(_i32p(obs), K, N, pid, _i32p(out), cap)
    return out[:n]
