"""Granular extraction profile: score map / NMS / top-k / orientation /
descriptors per level, with true D2H sync per measurement."""

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


def t(label, fn, n=8):
    sync(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    print(f"{label:44s} med={np.median(ts)*1e3:8.2f}ms", flush=True)


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
    print("setup done", flush=True)

    f_pyr = jax.jit(lambda im: pyramid.build_pyramid(
        im, cfg.orb.n_levels, cfg.orb.scale_factor))
    t("pyramid (8 levels + blur)", lambda: f_pyr(img_dev))
    levels, blurred = f_pyr(img_dev)
    lv0 = levels[0]

    f_score = jax.jit(lambda im: fast.fast_score_map(im, 20.0))
    t("fast_score_map L0 (1 threshold)", lambda: f_score(lv0))
    f_nms = jax.jit(lambda im: fast.nms3(im))
    sc = f_score(lv0)
    t("nms3 L0", lambda: f_nms(sc))

    budgets = orb.level_budgets(cfg.orb.n_features, cfg.orb.n_levels,
                                cfg.orb.scale_factor)
    f_det0 = jax.jit(lambda im: fast.detect_level(
        im, capacity=max(8, budgets[0]), ini_threshold=20.0, min_threshold=7.0,
        cell_size=cfg.orb.cell_size, border=cfg.orb.edge_threshold))
    t("detect_level L0 (both thresholds)", lambda: f_det0(lv0))
    xy0, s0, v0 = f_det0(lv0)

    f_ori = jax.jit(orb.compute_orientation)
    t("orientation L0 (217 kp)", lambda: f_ori(lv0, xy0))
    ang0 = f_ori(lv0, xy0)
    f_desc = jax.jit(orb.compute_descriptors)
    t("descriptors L0 (217 kp)", lambda: f_desc(blurred[0], xy0, ang0))

    f_ext = jax.jit(lambda im: orb.extract_features(im, cfg.orb))
    t("extract_features (full)", lambda: f_ext(img_dev))


if __name__ == "__main__":
    main()
