"""Micro-profile of the per-frame fast path on the default (TPU) platform:
upload / dispatch / device compute / host sync broken out per frame."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.models import tracking as trk
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
    n = int(os.environ.get("PROF_FRAMES", "40"))
    seq = SyntheticSequence(cfg.camera, n_frames=n)
    frames = [seq.frame(i) for i in range(n)]
    sysm = System(cfg)
    # Full warm pass (compile everything).
    for ts, img in frames:
        sysm.track_monocular(img, ts)
    sysm.shutdown()
    print("warm pass done", flush=True)

    # Timed pass with instrumented fast path.
    sysm = System(cfg)
    t = sysm.tracker
    stats = {k: [] for k in ("upload", "dispatch", "block", "scalar", "rest")}

    orig_fast = t._track_frame_fast

    def instrumented(img_dev, timestamp):
        t0 = time.perf_counter()
        m, feat, frame_is2, pose, track_pt, n_inl = trk._fused_track_step(
            t.m, img_dev, t.last_frame.pose, jnp.asarray(t.velocity),
            t._track_pt_dev, t.last_frame.feat.octave,
            t._local_ids, t._local_mask,
            t.intr, t._inv_sigma2_lv,
            t.cfg.orb, t.cfg.orb.scale_factor, t.cfg.orb.n_levels,
            t.wh, t.cfg.matcher.search_radius_motion,
            t.cfg.camera.has_distortion,
        )
        t1 = time.perf_counter()
        n_inl.block_until_ready()
        t2 = time.perf_counter()
        n = int(n_inl)
        t3 = time.perf_counter()
        stats["dispatch"].append(t1 - t0)
        stats["block"].append(t2 - t1)
        stats["scalar"].append(t3 - t2)
        # Run the real path for state updates (recompute; costs one extra
        # dispatch but state stays correct).
        orig_fast(img_dev, timestamp)

    t._track_frame_fast = instrumented

    per_frame = []
    for i, (ts, img) in enumerate(frames):
        tf = time.perf_counter()
        tu0 = time.perf_counter()
        _ = jnp.asarray(img, jnp.uint8)
        _.block_until_ready()
        stats["upload"].append(time.perf_counter() - tu0)
        sysm.track_monocular(img, ts)
        per_frame.append(time.perf_counter() - tf)
    sysm.shutdown()

    pf = np.array(per_frame[5:]) * 1e3
    print(f"frame total: med={np.median(pf):.1f}ms mean={pf.mean():.1f}ms")
    for k, v in stats.items():
        if not v:
            continue
        v = np.array(v[3:]) * 1e3
        if v.size:
            print(f"{k:10s} med={np.median(v):7.2f}ms mean={v.mean():7.2f}ms "
                  f"max={v.max():7.1f}ms n={v.size}")


if __name__ == "__main__":
    main()
