"""End-to-end smoke driver: synthetic room sequence -> VO + carving + ATE.

Usage: python scripts/run_synthetic.py [n_frames] [--cpu]
"""

import os
import sys
import time

if "--cpu" in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

if "--cpu" in sys.argv:
    # sitecustomize forces jax_platforms="axon,cpu"; override explicitly.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence
from orb_slam_free_space_carving_tpu.utils.trajectory import ate_rmse


def small_config() -> SystemConfig:
    cam = CameraConfig(
        fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320, height=240,
    )
    # 2x the usual budget like the reference's init extractor (Tracking.cc:122).
    orb = ORBConfig(n_features=800, n_levels=4, n_features_pad=1024)
    cap = CapacityConfig(
        max_keyframes=64, max_points=16384,
        local_ba_window=8, local_ba_fixed=4,
        local_ba_points=4096, local_ba_obs=8192,
    )
    carving = CarvingConfig(grid_resolution=64, ray_samples=64)
    return SystemConfig(camera=cam, orb=orb, capacity=cap, carving=carving,
                        deterministic=True)


def main():
    n_frames = 60
    for a in sys.argv[1:]:
        if a.isdigit():
            n_frames = int(a)
    cfg = small_config()
    seq = SyntheticSequence(cfg.camera, n_frames=n_frames)
    sysm = System(cfg)

    t_start = time.perf_counter()
    times = []
    for i, (ts, img) in enumerate(seq):
        t0 = time.perf_counter()
        sysm.track_monocular(img, ts)
        dt = time.perf_counter() - t0
        times.append(dt)
        st = sysm.get_tracking_state()
        if i % 10 == 0 or st == trk.LOST:
            print(f"frame {i:3d} state={st} tracked={sysm.get_tracked_points()} "
                  f"kfs={int(sysm.map_host.kf_valid.sum())} "
                  f"pts={int(sysm.map_host.pt_valid.sum())} dt={dt*1e3:.0f}ms")
    sysm.shutdown()
    total = time.perf_counter() - t_start

    ts_arr, poses, states = sysm.frame_trajectory()
    ok = states == trk.OK
    print(f"tracked {ok.sum()}/{n_frames} frames; total {total:.1f}s "
          f"({n_frames/total:.1f} fps incl. compile)")
    if ok.sum() >= 10:
        from orb_slam_free_space_carving_tpu.utils import lie
        import jax.numpy as jnp

        est_pos = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
        gt_pos = seq.gt_positions()[ok]
        ate = ate_rmse(est_pos, gt_pos, with_scale=True)
        print(f"ATE RMSE (scale-aligned): {ate:.4f} m")
    if sysm.carver is not None and sysm.carver.vertices is not None:
        print(f"mesh: {len(sysm.carver.vertices)} verts, "
              f"{len(sysm.carver.faces)} tris, {sysm.carver.n_meshes} updates")
    med = np.median(times[5:]) if len(times) > 10 else float("nan")
    print(f"median frame time (warm): {med*1e3:.1f} ms")
    ba = sysm.local_mapper.ba_times_ms
    if ba:
        print(f"local BA: {np.median(ba):.1f} ms/keyframe (n={len(ba)})")


if __name__ == "__main__":
    main()
