"""Benchmark: end-to-end tracking+carving throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.md): the reference is "real-time" at 30 fps on CPU with a
~33 ms/frame budget; the north-star target is >=5x reference CPU FPS on one
chip, i.e. >=150 fps for the tracking+carving pipeline.  ``vs_baseline`` is
measured_fps / 30.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np


def main():
    from orb_slam_free_space_carving_tpu.config import (
        CameraConfig, CapacityConfig, CarvingConfig, ORBConfig, SystemConfig,
    )
    from orb_slam_free_space_carving_tpu.models.system import System
    from orb_slam_free_space_carving_tpu.models import tracking as trk
    from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

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
    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    seq = SyntheticSequence(cfg.camera, n_frames=n_frames)
    # Pre-render so host rendering cost doesn't pollute the pipeline timing.
    frames = [seq.frame(i) for i in range(n_frames)]

    # Pass 1: compile warm-up over the FULL sequence.  Keyframe events,
    # mapping, carving and loop kernels compile lazily at their first
    # occurrence (which can be deep into the run); through the TPU tunnel a
    # single compile costs seconds-to-minutes, so a head-only warmup would
    # leave compiles inside the timed window.  The persistent compile cache
    # (.jax_cache) + in-process executable cache make pass 2 pure compute.
    sysm = System(cfg)
    for ts, img in frames:
        sysm.track_monocular(img, ts)
    sysm.shutdown()

    # Pass 2: fresh engine state, fully compiled code — the timed run.
    sysm = System(cfg)
    warm = min(12, n_frames // 4)
    for ts, img in frames[:warm]:
        sysm.track_monocular(img, ts)
    t0 = time.perf_counter()
    for ts, img in frames[warm:]:
        sysm.track_monocular(img, ts)
    sysm.shutdown()
    dt = time.perf_counter() - t0
    fps = (n_frames - warm) / dt

    baseline_fps = 30.0
    print(json.dumps({
        "metric": "tracking_carving_fps",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
