"""Dispatch-cost probe for the fused track step on the tunneled TPU.

Measures, with a warm compile cache and the real compiled program:
  a) k chained dispatches + ONE final readback (throughput ceiling)
  b) per-dispatch host blocking time WITHOUT any readback
This attributes the ~30-40ms/frame seen in profile_bench: tunnel RTT per
dispatch vs. device compute vs. readback latency.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import dataclasses

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_config
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.models import tracking as trk


def main():
    cfg = make_config()           # async mode: keyframe work off-thread
    from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

    n = 24
    seq = SyntheticSequence(cfg.camera, n_frames=n)
    frames = [seq.frame(i) for i in range(n)]
    sysm = System(cfg, enable_carving=False, enable_loop_closing=False)
    for ts, img in frames:
        sysm.track_monocular(img, ts)
    sysm.runner.flush()
    t = sysm.tracker
    print("warm done, state", t.state, flush=True)
    if t.state != trk.OK or t._track_pt_dev is None:
        print("tracker not in fast-path state; abort")
        return

    imgs = [jnp.asarray(frames[i][1], jnp.uint8) for i in range(8)]
    for im in imgs:
        im.block_until_ready()
    if t._velocity_dev is None:
        t._velocity_dev = jnp.asarray(t.velocity)

    def step(pose, vel, tp, oct_, ctrv, ctrf, i):
        return trk._fused_track_step(
            t.m, imgs[i % 8], pose, vel, tp, oct_,
            t._local_ids, t._local_mask, t.intr, t._inv_sigma2_lv,
            ctrv, ctrf,
            t.cfg.orb, t.cfg.orb.scale_factor, t.cfg.orb.n_levels,
            t.wh, t.cfg.matcher.search_radius_motion,
            t.cfg.camera.has_distortion, opt_cfg=t.cfg.optimizer,
        )

    state0 = (t.last_frame.pose, t._velocity_dev, t._track_pt_dev,
              t.last_frame.feat.octave, t.host.ctr_visible, t.host.ctr_found)

    def chain(k, collect_dispatch=False):
        pose, vel, tp, oct_, ctrv, ctrf = state0
        disp = []
        last = None
        for i in range(k):
            t0 = time.perf_counter()
            (feat, fis2, pose, tp, n_inl, vel, ctrv, ctrf) = step(
                pose, vel, tp, oct_, ctrv, ctrf, i)
            disp.append(time.perf_counter() - t0)
            oct_ = feat.octave
            last = n_inl
        t0 = time.perf_counter()
        v = int(last)
        sync_ms = (time.perf_counter() - t0) * 1e3
        if collect_dispatch:
            d = np.array(disp) * 1e3
            print(f"   dispatch ms: med={np.median(d):.2f} "
                  f"p90={np.percentile(d, 90):.2f} max={d.max():.2f} "
                  f"final readback={sync_ms:.2f}ms (n_inl={v})", flush=True)

    chain(4)   # warm
    for k in (1, 4, 16, 32):
        ts = []
        for r in range(6):
            t0 = time.perf_counter()
            chain(k, collect_dispatch=(r == 5 and k in (16, 32)))
            ts.append(time.perf_counter() - t0)
        med = np.median(ts) * 1e3
        print(f"chain k={k:3d}: {med:8.2f}ms total, {med/k:7.2f}ms/frame, "
              f"{1000*k/med:7.1f} fps ceiling", flush=True)

    sysm.shutdown()


if __name__ == "__main__":
    main()
