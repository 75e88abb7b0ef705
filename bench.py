"""Benchmark: end-to-end tracking+mapping+loop+carving throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference is "real-time" at 30 fps on CPU with a
~33 ms/frame budget; the north-star target is >=5x reference CPU FPS on one
chip, i.e. >=150 fps for the tracking+carving pipeline.  ``vs_baseline`` is
measured_fps / 30.

Workload (VERDICT r2 #2: exercise the WHOLE claim, not just tracking): a
640x480 full-circle circuit inside a closed textured room — constant camera
translation forces regular keyframes, mesh cadence every 2 keyframes lands
>=10 mesh updates in the timed pass, and the circuit's end revisits its start
so the loop-closure chain (BoW detect -> Sim3 -> correct -> GBA) fires inside
the timed window.

Timing protocol on the tunneled TPU:
- every jitted program lands in the persistent compile cache
  (``.jax_cache_tpu``, committed), so a fresh driver run pays cache loads,
  not compiles;
- warm-up runs a SHORT circuit (same scene, same programs, fewer frames)
  end-to-end including a loop closure and final GBA, touching every program;
- the timed pass runs the async stage pipeline (mapping/BA/loop/carving on
  the stage worker; tracking = one device dispatch per frame with lagged
  decision readbacks) — the same latency-hiding the reference gets from its
  pthreads.

Extra metrics (BA ms/keyframe — the BASELINE.md metric — keyframe/mesh/loop
counts and the per-stage wall-time breakdown) go to BENCH_DETAIL.json; stdout
carries only the driver's JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np


def make_config():
    from orb_slam_free_space_carving_tpu.config import (
        CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
    )

    return SystemConfig(
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                            width=640, height=480),
        orb=ORBConfig(n_features=1000, n_levels=8, n_features_pad=1024),
        capacity=CapacityConfig(
            max_keyframes=128, max_points=32768,
            local_ba_window=16, local_ba_fixed=8,
            local_ba_points=8192, local_ba_obs=16384,
            gba_obs=65536,
        ),
        carving=CarvingConfig(grid_resolution=128, ray_samples=96,
                              mesh_every_kfs=2),
        deterministic=False,     # async stage pipeline (P1-P5)
    )


def _circuit_frames(cam, n_frames):
    from orb_slam_free_space_carving_tpu.utils.synthetic import (
        SyntheticSequence, circuit_trajectory, make_closed_room_scene,
    )

    # One full lap in the first 80% of the frames, then re-walk the start of
    # the circle: the revisit dwell is what lets the loop-closure chain
    # (BoW consistency over >=3 consecutive keyframes -> Sim3 -> correct ->
    # GBA) actually fire inside the benchmark window — a lap that ends at
    # frame N-1 leaves no time to detect it.
    # Radius 1.2 m: ~2 cm translation per 1-degree step.  The old 0.7 m
    # circuit was rotation-dominant (1.2 cm baseline/frame), the classic
    # degenerate geometry for monocular SLAM — init barely clears the
    # baseline/depth gate and the map bleeds inliers regardless of backend
    # (the reference's TUM/KITTI validation sequences are all
    # translation-rich for the same reason).
    lap = min(360, int(n_frames * 0.8))
    poses = circuit_trajectory(lap, radius=1.2)
    poses = poses + (poses * ((n_frames - lap) // lap + 1))[: n_frames - lap]
    seq = SyntheticSequence(
        cam, n_frames=n_frames, scene=make_closed_room_scene(),
        poses_cw=poses,
    )
    return [seq.frame(i) for i in range(n_frames)]


def _run(cfg, frames, settle=0):
    from orb_slam_free_space_carving_tpu.models.system import System

    sysm = System(cfg)
    for ts, img in frames[:settle]:
        sysm.track_monocular(img, ts)
    t0 = time.perf_counter()
    for ts, img in frames[settle:]:
        sysm.track_monocular(img, ts)
    sysm.runner.flush()
    dt = time.perf_counter() - t0
    return sysm, dt


def main():
    cfg = make_config()
    n_frames = int(os.environ.get("BENCH_FRAMES", "450"))
    n_warm = int(os.environ.get("BENCH_WARMUP", "120"))

    # Pass 1 (compile warm-up): a short full circuit — same scene, same
    # camera, same jitted programs incl. loop closure + GBA + meshes.  With
    # the persistent cache these are loads, not compiles, on later runs.
    t_warm0 = time.perf_counter()
    sysm, _ = _run(cfg, _circuit_frames(cfg.camera, n_warm))
    sysm.shutdown()
    warm_s = time.perf_counter() - t_warm0

    # Pass 2: fresh engine state, fully compiled code — the timed run.
    from orb_slam_free_space_carving_tpu.utils import timing

    frames = _circuit_frames(cfg.camera, n_frames)
    timing.reset()
    settle = 12
    sysm, dt = _run(cfg, frames, settle=settle)
    fps = (n_frames - settle) / dt
    ba_ms = sysm.local_mapper.ba_times_ms
    detail = {
        "fps": round(fps, 2),
        "frames_timed": n_frames - settle,
        "warmup_s": round(warm_s, 1),
        "ba_ms_per_keyframe": round(float(np.median(ba_ms)), 1) if ba_ms else None,
        "n_keyframes": int(sysm.map_host.kf_valid.sum()),
        "n_points": int(sysm.map_host.pt_valid.sum()),
        "n_mesh_updates": sysm.carver.n_meshes if sysm.carver else 0,
        "n_full_recarves": sysm.carver.n_full_recarves if sysm.carver else 0,
        "n_inc_recarves": sysm.carver.n_inc_updates if sysm.carver else 0,
        "n_loops": sysm.loop_closer.n_loops_closed if sysm.loop_closer else 0,
        "platform": jax.devices()[0].platform,
        "events": timing.event_counts(),
        "stages": timing.snapshot(),
    }
    sysm.shutdown()
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass

    baseline_fps = 30.0
    print(json.dumps({
        "metric": "tracking_carving_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
