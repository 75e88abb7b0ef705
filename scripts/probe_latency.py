"""Raw TPU-tunnel latency probe: dispatch RTT, upload cost, and the three
hot programs (fused track step / local BA / carve) timed individually with
the exact bench config so the persistent cache hits."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np


def timeit(label, fn, n=20):
    fn()  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{label:32s} med={np.median(ts):8.2f}ms min={ts.min():8.2f}ms "
          f"max={ts.max():8.2f}ms", flush=True)


def main():
    dev = jax.devices()[0]
    print("platform:", dev.platform, flush=True)

    # 1. Pure dispatch RTT: trivial jitted program, block on result.
    one = jnp.ones((8, 8), jnp.float32)
    f_triv = jax.jit(lambda x: x + 1.0)
    timeit("trivial jit (RTT)", lambda: f_triv(one).block_until_ready())

    # 2. Image upload 640x480 u8.
    img = np.random.randint(0, 255, (480, 640), np.uint8)
    timeit("upload 640x480 u8",
           lambda: jnp.asarray(img, jnp.uint8).block_until_ready())

    # 3. 10 chained trivial dispatches without blocking (pipeline depth).
    def chain():
        x = one
        for _ in range(10):
            x = f_triv(x)
        x.block_until_ready()
    timeit("10 chained dispatches", chain)

    t0 = time.perf_counter()
    sys.stdout.flush()

    # 4. Fused track step with the bench config.
    sys.path.insert(0, "/root/repo")
    from bench import make_config
    from orb_slam_free_space_carving_tpu.models.system import System
    from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

    import dataclasses
    cfg = dataclasses.replace(make_config(), deterministic=True)
    seq = SyntheticSequence(cfg.camera, n_frames=40)
    frames = [seq.frame(i) for i in range(40)]
    sysm = System(cfg)
    print(f"system built {time.perf_counter()-t0:.1f}s", flush=True)
    for i, (ts, img_i) in enumerate(frames[:30]):
        tf = time.perf_counter()
        sysm.track_monocular(img_i, ts)
        print(f"frame {i}: {(time.perf_counter()-tf)*1e3:.0f}ms", flush=True)

    t = sysm.tracker
    from orb_slam_free_space_carving_tpu.models import tracking as trk

    img_dev = jnp.asarray(frames[30][1], jnp.uint8)
    if t._velocity_dev is None and t.velocity is not None:
        t._velocity_dev = jnp.asarray(t.velocity)

    def fused():
        out = trk._fused_track_step(
            t.m, img_dev, t.last_frame.pose, t._velocity_dev,
            t._track_pt_dev, t.last_frame.feat.octave,
            t._local_ids, t._local_mask,
            t.intr, t._inv_sigma2_lv,
            t.host.ctr_visible, t.host.ctr_found,
            t.cfg.orb, t.cfg.orb.scale_factor, t.cfg.orb.n_levels,
            t.wh, t.cfg.matcher.search_radius_motion,
            t.cfg.camera.has_distortion,
        )
        out[4].block_until_ready()

    timeit("fused track step", fused)

    # 5. Local BA on current map via the mapper's own entry.
    lm = sysm.local_mapper
    kf = int(np.max(np.where(sysm.map_host.kf_valid)[0]))
    timeit("local BA (KF window)", lambda: lm._local_bundle_adjustment(kf), n=5)

    # 6. Carve mesh update.
    if sysm.carver is not None:
        timeit("carve update_mesh", sysm.carver.update_mesh, n=3)

    sysm.shutdown()


if __name__ == "__main__":
    main()
