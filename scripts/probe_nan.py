"""Reproduce the loop-e2e NaN pose and locate its origin."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

# sitecustomize forces jax_platforms="axon,cpu"; override to really use CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/osfsc_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, CapacityConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.utils.synthetic import (
    SyntheticSequence, circuit_trajectory, make_closed_room_scene,
)

cfg = SystemConfig(
    camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                        width=320, height=240),
    orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
    capacity=CapacityConfig(
        max_keyframes=64, max_points=16384,
        local_ba_window=8, local_ba_fixed=4,
        local_ba_points=4096, local_ba_obs=8192,
        gba_obs=16384, loop_points=1024, sim3_pairs=512,
    ),
    deterministic=True,
)
n = 150
seq = SyntheticSequence(cfg.camera, n_frames=n,
                        scene=make_closed_room_scene(),
                        poses_cw=circuit_trajectory(n))
sysm = System(cfg, enable_carving=False)

# Hook the loop-closing numeric stages to find which one emits NaN.
from orb_slam_free_space_carving_tpu.ops import posegraph
from orb_slam_free_space_carving_tpu.models import global_ba as gba_mod

_orig_eg = posegraph.optimize_essential_graph


def eg_hook(*a, **k):
    out = _orig_eg(*a, **k)
    arr = np.asarray(out)
    if not np.all(np.isfinite(arr)):
        print("NAN from optimize_essential_graph:",
              np.isnan(arr).any(1).sum(), "rows")
    return out


posegraph.optimize_essential_graph = eg_hook

_orig_solve = gba_mod.GlobalBA.solve


def solve_hook(self, snap, intr, iterations=None):
    out = _orig_solve(self, snap, intr, iterations)
    if out is not None:
        if not (np.all(np.isfinite(out["poses"]))
                and np.all(np.isfinite(out["points"]))):
            print("NAN from GBA solve: poses",
                  np.isnan(out["poses"]).any(1).sum(),
                  "points", np.isnan(out["points"]).any(1).sum(),
                  "cost", out["cost"])
    return out


gba_mod.GlobalBA.solve = solve_hook
prev_map_ok = True
for i, (ts, img) in enumerate(seq):
    pose = sysm.track_monocular(img, ts)
    p = np.asarray(pose)
    st = sysm.tracker.state
    m = sysm.tracker.m
    kfv = np.asarray(m.kf_valid)
    kf_ok = np.all(np.isfinite(np.asarray(m.kf_pose)[kfv]))
    pv = np.asarray(m.pt_valid)
    pt_ok = np.all(np.isfinite(np.asarray(m.pt_xyz)[pv]))
    if prev_map_ok and not (kf_ok and pt_ok):
        bad_kf = np.where(~np.isfinite(np.asarray(m.kf_pose)).all(1) & kfv)[0]
        bad_pt = np.where(~np.isfinite(np.asarray(m.pt_xyz)).all(1) & pv)[0]
        print(f"frame {i}: MAP NaN enters: kfs={bad_kf[:10]} npts={bad_pt.size}")
        prev_map_ok = False
    if not np.all(np.isfinite(p)):
        print(f"frame {i}: NaN pose, state={st}, n_tracked={sysm.tracker.n_tracked}")
    if i % 25 == 0:
        print(f"frame {i}: state={st} n={sysm.tracker.n_tracked} "
              f"kf={int(sysm.map_host.kf_valid.sum())} "
              f"pts={int(sysm.map_host.pt_valid.sum())}")
sysm.tracker.finalize_trajectory()
traj = sysm.tracker.trajectory
bad = [i for i, (_, p, s) in enumerate(traj)
       if s == 2 and not np.all(np.isfinite(np.asarray(p)))]
print("OK-state NaN frames:", bad)
print("loops:", sysm.loop_closer.n_loops_closed)
sysm.shutdown()
