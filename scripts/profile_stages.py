"""Per-stage timing breakdown of the per-frame hot path on the current
platform.  Writes BENCH_STAGES.json: extraction sub-parts (pyramid / FAST /
orientation / descriptors), fused track step, H2D upload — the attribution
VERDICT r2 asked for."""

import json
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


def _sync(x):
    """True completion barrier: a D2H readback of one leaf (on the axon
    backend block_until_ready alone does not wait until a first readback
    has 'primed' the stream — measured in round 3)."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        np.asarray(leaves[0])


def timeit(label, fn, n=10, results=None):
    _sync(fn())  # warm
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn())
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts) * 1e3)
    print(f"{label:34s} med={med:8.2f}ms min={min(ts)*1e3:8.2f}ms", flush=True)
    if results is not None:
        results[label] = round(med, 2)
    return med


def main():
    from orb_slam_free_space_carving_tpu.config import (
        CameraConfig, ORBConfig, SystemConfig,
    )
    from orb_slam_free_space_carving_tpu.ops import fast, orb, pyramid
    from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

    cfg = SystemConfig(
        camera=CameraConfig(fx=517.3, fy=516.5, cx=318.6, cy=255.3,
                            width=640, height=480),
        orb=ORBConfig(n_features=1000, n_levels=8, n_features_pad=1024),
    )
    seq = SyntheticSequence(cfg.camera, n_frames=2)
    _, img = seq.frame(0)
    img_dev = jnp.asarray(img, jnp.uint8)
    results = {}

    # --- pyramid ---
    f_pyr = jax.jit(lambda im: pyramid.build_pyramid(
        im, cfg.orb.n_levels, cfg.orb.scale_factor))
    timeit("pyramid (8 levels)", lambda: f_pyr(img_dev),
           results=results)
    levels, blurred = f_pyr(img_dev)
    jax.block_until_ready((levels, blurred))

    # --- FAST per level ---
    budgets = orb.level_budgets(cfg.orb.n_features, cfg.orb.n_levels,
                                cfg.orb.scale_factor)
    fns = []
    for l in range(cfg.orb.n_levels):
        cap = max(8, budgets[l])
        f = jax.jit(lambda im, c=cap: fast.detect_level(
            im, capacity=c, ini_threshold=float(cfg.orb.ini_th_fast),
            min_threshold=float(cfg.orb.min_th_fast),
            cell_size=cfg.orb.cell_size, border=cfg.orb.edge_threshold))
        fns.append((l, f))
    lv0 = levels[0]
    timeit("FAST detect L0 (640x480)",
           lambda: fns[0][1](lv0), results=results)

    timeit("FAST detect all 8 levels",
           lambda: [f(levels[l]) for l, f in fns], results=results)

    # --- orientation + descriptors (level 0) ---
    xy0, score0, valid0 = fns[0][1](lv0)
    jax.block_until_ready(xy0)
    f_ori = jax.jit(orb.compute_orientation)
    timeit("orientation L0", lambda: f_ori(lv0, xy0),
           results=results)
    ang0 = f_ori(lv0, xy0)
    f_desc = jax.jit(orb.compute_descriptors)
    timeit("descriptors L0",
           lambda: f_desc(blurred[0], xy0, ang0),
           results=results)

    # --- full extraction ---
    f_ext = jax.jit(lambda im: orb.extract_features(im, cfg.orb))
    timeit("extract_features (full)",
           lambda: f_ext(img_dev), results=results)

    # --- H2D ---
    timeit("H2D 640x480 u8",
           lambda: jnp.asarray(img, jnp.uint8),
           results=results)

    out = os.path.join(os.path.dirname(__file__), "..", "BENCH_STAGES.json")
    with open(out, "w") as f:
        json.dump({"platform": jax.devices()[0].platform, **results}, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
