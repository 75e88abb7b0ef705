"""Pure device throughput of the fused track step: 16 chained steps, ONE sync.

This is the fps ceiling once tracking is sync-free (the axon tunnel puts a
~25ms latency floor on every device->host sync after the first transfer, so
the per-frame hot path must amortize one sync over k frames)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import dataclasses

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_config
from orb_slam_free_space_carving_tpu.models.system import System
from orb_slam_free_space_carving_tpu.models import tracking as trk
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence


def main():
    cfg = dataclasses.replace(make_config(), deterministic=True)
    seq = SyntheticSequence(cfg.camera, n_frames=40)
    frames = [seq.frame(i) for i in range(40)]
    sysm = System(cfg)
    for i, (ts, img_i) in enumerate(frames[:30]):
        sysm.track_monocular(img_i, ts)
    print("warm done", flush=True)

    t = sysm.tracker
    imgs = [jnp.asarray(frames[30 + i][1], jnp.uint8) for i in range(8)]
    if t._velocity_dev is None and t.velocity is not None:
        t._velocity_dev = jnp.asarray(t.velocity)

    def chain(k):
        pose = t.last_frame.pose
        vel = t._velocity_dev
        tp = t._track_pt_dev
        oct_ = t.last_frame.feat.octave
        ctrv, ctrf = t.host.ctr_visible, t.host.ctr_found
        last = None
        for i in range(k):
            (feat, fis2, pose, tp, n_inl, vel, ctrv, ctrf) = trk._fused_track_step(
                t.m, imgs[i % 8], pose, vel, tp, oct_,
                t._local_ids, t._local_mask, t.intr, t._inv_sigma2_lv,
                ctrv, ctrf,
                t.cfg.orb, t.cfg.orb.scale_factor, t.cfg.orb.n_levels,
                t.wh, t.cfg.matcher.search_radius_motion,
                t.cfg.camera.has_distortion,
            )
            oct_ = feat.octave
            last = n_inl
        last.block_until_ready()

    for k in (1, 4, 16):
        chain(k)  # warm
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            chain(k)
            ts.append(time.perf_counter() - t0)
        med = np.median(ts) * 1e3
        print(f"chain k={k:3d}: {med:8.2f}ms total, {med/k:7.2f}ms/frame, "
              f"{1000*k/med:7.1f} fps ceiling", flush=True)

    sysm.shutdown()


if __name__ == "__main__":
    main()
