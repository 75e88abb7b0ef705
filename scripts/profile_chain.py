"""Floor-robust profile: chain N dependent calls, sync once.

per-call device time = (T_chain(N) - T_chain(1)) / (N-1), independent of the
tunnel's per-sync RTT floor (which varies 0-30 ms between sessions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from orb_slam_free_space_carving_tpu.config import (
    CameraConfig, ORBConfig, SystemConfig,
)
from orb_slam_free_space_carving_tpu.ops import fast, orb, pyramid
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]


def chain_time(label, step, x0, n=16, reps=3):
    """step: x -> x (same shape/dtype); times an n-deep dependent chain."""
    def run(k):
        x = x0
        for _ in range(k):
            x = step(x)
        sync(x)
    run(2)
    t1s, tns = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); run(1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); run(n); tns.append(time.perf_counter() - t0)
    t1 = np.median(t1s); tn = np.median(tns)
    per = (tn - t1) / (n - 1) * 1e3
    print(f"{label:40s} per-call={per:8.2f}ms  (1-call={t1*1e3:7.1f}ms)",
          flush=True)
    return per


def main():
    cfg = SystemConfig(
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                            width=640, height=480),
        orb=ORBConfig(n_features=1000, n_levels=8, n_features_pad=1024),
    )
    seq = SyntheticSequence(cfg.camera, n_frames=2)
    _, img = seq.frame(0)
    img_dev = jnp.asarray(img, jnp.uint8)
    sync(img_dev)

    # Floor reference
    f_triv = jax.jit(lambda x: x + 1)
    chain_time("trivial (u8 image +1)", f_triv, img_dev)

    f_pyr = jax.jit(lambda im: pyramid.build_pyramid(
        im, cfg.orb.n_levels, cfg.orb.scale_factor))
    levels, blurred = f_pyr(img_dev)
    sync(levels)
    lv0 = levels[0]

    # image -> image steps so chaining works
    f_pyr_i = jax.jit(lambda im: pyramid.build_pyramid(
        im, cfg.orb.n_levels, cfg.orb.scale_factor)[0][0])
    chain_time("pyramid+blur (8 levels)", f_pyr_i, img_dev)

    f_score_i = jax.jit(
        lambda im: fast.fast_score_map(im, 20.0).astype(jnp.uint8))
    chain_time("fast_score_map L0", f_score_i, lv0)

    f_nms_i = jax.jit(lambda im: fast.nms3(im.astype(jnp.float32)).astype(jnp.uint8))
    chain_time("nms3 L0", f_nms_i, lv0)

    budgets = orb.level_budgets(cfg.orb.n_features, cfg.orb.n_levels,
                                cfg.orb.scale_factor)
    f_det_i = jax.jit(lambda im: (im + fast.detect_level(
        im, capacity=max(8, budgets[0]), ini_threshold=20.0, min_threshold=7.0,
        cell_size=cfg.orb.cell_size, border=cfg.orb.edge_threshold
    )[0].sum().astype(jnp.uint8)))
    chain_time("detect_level L0 (hi+lo)", f_det_i, lv0)

    f_det0 = jax.jit(lambda im: fast.detect_level(
        im, capacity=max(8, budgets[0]), ini_threshold=20.0, min_threshold=7.0,
        cell_size=cfg.orb.cell_size, border=cfg.orb.edge_threshold))
    xy0, _, _ = f_det0(lv0)
    sync(xy0)
    f_ori_i = jax.jit(
        lambda im: im + orb.compute_orientation(im, xy0).sum().astype(jnp.uint8))
    chain_time("orientation L0", f_ori_i, lv0)

    ang0 = jax.jit(orb.compute_orientation)(lv0, xy0)
    sync(ang0)
    f_desc_i = jax.jit(
        lambda im: im + orb.compute_descriptors(im, xy0, ang0).sum())
    chain_time("descriptors L0", f_desc_i, blurred[0])

    f_ext_i = jax.jit(
        lambda im: im + orb.extract_features(im, cfg.orb).desc.sum())
    chain_time("extract_features (full)", f_ext_i, img_dev)


if __name__ == "__main__":
    main()
