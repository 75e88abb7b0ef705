"""Phase-attributed version of bench.py: prints per-phase wall times and a
per-frame latency histogram so regressions are attributable (VERDICT r2 #1)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    from bench import make_config
    from orb_slam_free_space_carving_tpu.models.system import System
    from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

    cfg = make_config()
    n_frames = int(os.environ.get("BENCH_FRAMES", "120"))
    n_warm = min(int(os.environ.get("BENCH_WARMUP", "48")), n_frames)

    t0 = time.perf_counter()
    seq = SyntheticSequence(cfg.camera, n_frames=n_frames)
    frames = [seq.frame(i) for i in range(n_frames)]
    print(f"render {n_frames} frames: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    sysm = System(cfg)
    per = []
    for ts, img in frames[:n_warm]:
        t1 = time.perf_counter()
        sysm.track_monocular(img, ts)
        per.append(time.perf_counter() - t1)
        if len(per) % 8 == 0:
            print(f"  warm f{len(per)}: last8 med "
                  f"{np.median(per[-8:])*1e3:.0f}ms", flush=True)
    sysm.shutdown()
    print(f"warmup {n_warm} frames: {time.perf_counter()-t0:.1f}s", flush=True)

    from orb_slam_free_space_carving_tpu.utils import timing

    timing.reset()
    t0 = time.perf_counter()
    sysm = System(cfg)
    settle = min(12, n_frames // 4)
    for ts, img in frames[:settle]:
        sysm.track_monocular(img, ts)
    print(f"settle {settle}: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    per = []
    for ts, img in frames[settle:]:
        t1 = time.perf_counter()
        sysm.track_monocular(img, ts)
        per.append(time.perf_counter() - t1)
    sysm.runner.flush()
    dt = time.perf_counter() - t0
    per_ms = np.array(per) * 1e3
    print(f"timed {len(per)} frames: {dt:.1f}s = {len(per)/dt:.1f} fps")
    print(f"frame ms: p10={np.percentile(per_ms,10):.1f} med={np.median(per_ms):.1f} "
          f"p90={np.percentile(per_ms,90):.1f} p99={np.percentile(per_ms,99):.1f} "
          f"max={per_ms.max():.1f}")
    # Worst 10 frames with index (settle offset applied).
    worst = np.argsort(per_ms)[-10:][::-1]
    for w in worst:
        print(f"  frame {w+settle}: {per_ms[w]:.1f}ms")
    sysm.shutdown()
    from orb_slam_free_space_carving_tpu.utils import timing
    import json
    print(json.dumps(timing.snapshot(), indent=1))


if __name__ == "__main__":
    main()
