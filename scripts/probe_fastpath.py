"""Probe: fast-path stickiness + map health on the bench circuit (CPU-friendly).

Runs the bench workload (async pipeline, closed-room circuit) for
PROBE_FRAMES frames and prints the dispatch/recovery/slow-path event counts,
map size, and loop/carve counters — the health metrics VERDICT r4 demands
(>=90% fast-path frames, >=25 KFs, >=2000 points, a fired loop).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

if os.environ.get("PROBE_CPU", "1") == "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # sitecustomize forces jax_platforms="axon,cpu"; override for real.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/osfsc_jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import time

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from orb_slam_free_space_carving_tpu.models.system import System
    from orb_slam_free_space_carving_tpu.utils import timing

    if os.environ.get("PROBE_CPU", "1") == "1":
        # bench.py re-points the cache at the committed TPU cache; keep CPU
        # probe compiles out of it.
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/osfsc_jax_cache_cpu")

    cfg = bench.make_config()
    n_frames = int(os.environ.get("PROBE_FRAMES", "300"))
    frames = bench._circuit_frames(cfg.camera, n_frames)
    timing.reset()
    sysm = System(cfg)
    t0 = time.perf_counter()
    for ts, img in frames:
        sysm.track_monocular(img, ts)
    sysm.runner.flush()
    dt = time.perf_counter() - t0
    snap = timing.snapshot()
    out = {
        "frames": n_frames,
        "fps": round(n_frames / dt, 2),
        "events": timing.event_counts(),
        "slow_path_calls": snap.get("track.slow_path", {}).get("calls", 0),
        "finalize_ms": snap.get("track.finalize", {}).get("mean_ms"),
        "n_keyframes": int(sysm.map_host.kf_valid.sum()),
        "n_points": int(sysm.map_host.pt_valid.sum()),
        "n_loops": sysm.loop_closer.n_loops_closed if sysm.loop_closer else 0,
        "n_mesh_updates": sysm.carver.n_meshes if sysm.carver else 0,
        "n_inc_recarves": sysm.carver.n_inc_updates if sysm.carver else 0,
        "lost_frames": sum(1 for (_t, _p, s) in sysm.tracker.trajectory
                           if s == 3),
    }
    sysm.shutdown()
    print(json.dumps(out, indent=1))
    for k in sorted(snap):
        print(f"  {k}: {snap[k]['calls']}x {snap[k]['mean_ms']:.1f}ms")


if __name__ == "__main__":
    main()
