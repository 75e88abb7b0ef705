"""Time the fused-track-step sub-programs individually on the TPU."""

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

from orb_slam_free_space_carving_tpu.config import ORBConfig
from orb_slam_free_space_carving_tpu.ops import fast as fast_ops
from orb_slam_free_space_carving_tpu.ops import matching, orb, pose_opt
from orb_slam_free_space_carving_tpu.ops import pyramid as pyr_ops


def timeit(label, fn, n=15):
    t0 = time.perf_counter()
    fn()  # warm/compile
    print(f"{label:34s} compile+run {time.perf_counter()-t0:6.1f}s", flush=True)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(f"{label:34s} med={np.median(ts):8.2f}ms min={ts.min():8.2f}ms",
          flush=True)


def main():
    cfg = ORBConfig(n_features=1000, n_levels=8, n_features_pad=1024)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (480, 640), np.uint8))

    f_pyr = jax.jit(lambda im: pyr_ops.build_pyramid(im, 8, 1.2))
    timeit("build_pyramid(8)", lambda: jax.block_until_ready(f_pyr(img)))

    levels, blurred = f_pyr(img)

    budgets = orb.level_budgets(cfg.n_features, cfg.n_levels, cfg.scale_factor)

    def detect_all(levels):
        out = []
        for l in range(8):
            out.append(fast_ops.detect_level(
                levels[l], capacity=max(8, budgets[l]),
                ini_threshold=20.0, min_threshold=7.0,
                cell_size=cfg.cell_size, border=cfg.edge_threshold))
        return out

    f_det = jax.jit(detect_all)
    timeit("FAST detect (8 levels)", lambda: jax.block_until_ready(f_det(levels)))

    dets = f_det(levels)

    def ang_desc(levels, blurred, dets):
        out = []
        for l in range(8):
            xy = dets[l][0]
            ang = orb.compute_orientation(levels[l], xy)
            desc = orb.compute_descriptors(blurred[l], xy, ang)
            out.append((ang, desc))
        return out

    f_ad = jax.jit(ang_desc)
    timeit("orientation+descriptors (8 lv)",
           lambda: jax.block_until_ready(f_ad(levels, blurred, dets)))

    f_ext = jax.jit(lambda im: orb.extract_features(im, cfg))
    timeit("extract_features full", lambda: jax.block_until_ready(f_ext(img)))

    feat = f_ext(img)

    # Matching at fused-step shapes.
    d_a = jnp.asarray(rng.integers(0, 255, (1024, 32), np.uint8))
    d_b = jnp.asarray(rng.integers(0, 255, (2048, 32), np.uint8))
    uv_a = jnp.asarray(rng.uniform(0, 640, (1024, 2)), jnp.float32)
    uv_l = jnp.asarray(rng.uniform(0, 640, (2048, 2)), jnp.float32)
    vmask = jnp.ones(1024, bool)
    lmask = jnp.ones(2048, bool)

    def match_motion(da, db, uva, uvb):
        dist = matching.hamming_matrix(da, db[:1024])
        mask = matching.window_mask(uva, uvb[:1024], 15.0, vmask, vmask)
        return matching.masked_match(dist, mask, max_dist=100.0, ratio=0.9)

    f_mm = jax.jit(match_motion)
    timeit("hamming+match 1024x1024",
           lambda: jax.block_until_ready(f_mm(d_a, d_b, uv_a, uv_l[:1024])))

    def match_local(db, da, uvl, uva):
        dist = matching.hamming_matrix(db, da)
        mask = matching.window_mask(uvl, uva, 8.0, lmask, vmask)
        return matching.masked_match(dist, mask, max_dist=50.0, ratio=0.8)

    f_ml = jax.jit(match_local)
    timeit("hamming+match 2048x1024",
           lambda: jax.block_until_ready(f_ml(d_b, d_a, uv_l, uv_a)))

    # Pose opt at 1024 obs.
    intr = jnp.asarray([517.3, 516.5, 318.6, 255.3, 0, 0, 0, 0, 0], jnp.float32)
    pose0 = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
    pts = jnp.asarray(rng.uniform(-2, 2, (1024, 3)), jnp.float32)
    uv = jnp.asarray(rng.uniform(0, 480, (1024, 2)), jnp.float32)
    is2 = jnp.ones(1024, jnp.float32)
    mask = jnp.ones(1024, bool)

    f_po = jax.jit(lambda p, x, u, s, m: pose_opt.optimize_pose(p, x, u, s, m, intr))
    timeit("optimize_pose 1024 (4x10 GN)",
           lambda: jax.block_until_ready(f_po(pose0, pts, uv, is2, mask)))


if __name__ == "__main__":
    main()
