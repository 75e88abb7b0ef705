"""Per-stage timing of the pipeline on the default (TPU) platform."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence


def main():
    cfg = SystemConfig(
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                            width=640, height=480),
        orb=ORBConfig(n_features=1000, n_levels=8, n_features_pad=1024),
        capacity=CapacityConfig(
            max_keyframes=128, max_points=32768,
            local_ba_window=16, local_ba_fixed=8,
            local_ba_points=8192, local_ba_obs=16384,
        ),
        carving=CarvingConfig(grid_resolution=128, ray_samples=96),
    )
    n = int(os.environ.get("PROF_FRAMES", "60"))
    seq = SyntheticSequence(cfg.camera, n_frames=n)
    frames = [seq.frame(i) for i in range(n)]
    sysm = System(cfg)

    # Wrap stage methods with timers.
    import orb_slam_free_space_carving_tpu.models.tracking as trk_mod
    times = {}

    def wrap(obj, name):
        fn = getattr(obj, name)

        def wrapped(*a, **k):
            t0 = time.perf_counter()
            r = fn(*a, **k)
            times.setdefault(name, []).append(time.perf_counter() - t0)
            return r

        setattr(obj, name, wrapped)

    for nm in ["_track_frame_fast", "_track_frame", "_create_new_keyframe",
               "_refresh_local_points", "_monocular_initialization"]:
        wrap(sysm.tracker, nm)
    for nm in ["on_keyframe", "_create_new_points", "_fuse_neighbors",
               "_local_bundle_adjustment", "_cull_recent_points",
               "_cull_keyframes"]:
        wrap(sysm.local_mapper, nm)
    if sysm.loop_closer:
        wrap(sysm.loop_closer, "on_keyframe")
        times["loop_on_kf"] = times.pop("on_keyframe", [])
    if sysm.carver:
        wrap(sysm.carver, "update_mesh")

    t0 = time.perf_counter()
    for i, (ts, img) in enumerate(frames):
        tf = time.perf_counter()
        sysm.track_monocular(img, ts)
        dt = time.perf_counter() - tf
        times.setdefault("frame_total", []).append(dt)
        print(f"frame {i}: {dt*1e3:.0f}ms", flush=True)
    total = time.perf_counter() - t0
    print(f"\ntotal {total:.1f}s, {n/total:.2f} fps, kfs={int(sysm.map_host.kf_valid.sum())}")
    for k, v in sorted(times.items(), key=lambda kv: -sum(kv[1])):
        if not v:
            continue
        v = np.array(v) * 1e3
        print(f"{k:28s} n={len(v):4d} sum={v.sum():8.0f}ms med={np.median(v):7.1f}ms max={v.max():7.1f}ms")


if __name__ == "__main__":
    main()
