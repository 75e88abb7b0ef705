"""Per-op DEVICE cost inside the fused track step, measured the only way that
is honest on the tunnel: chain each op k times with data dependencies and ONE
final readback, so per-op cost = (chain time - readback RTT) / k.

Attribution for the ~19 ms/frame fused-step device time found by
probe_dispatch (53 fps ceiling)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import functools
import json

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import make_config
from orb_slam_free_space_carving_tpu.ops import fast, matching, orb as orb_ops, pyramid
from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

K = 24
RESULTS = {}


def chain_time(label, mk_step, x0, k=K, reps=5):
    """mk_step: x -> x' jitted; chains k steps, one final sync."""
    def run():
        x = x0
        for _ in range(k):
            x = mk_step(x)
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf)          # full completion barrier

    run()                         # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    med = np.median(ts) * 1e3
    RESULTS[label] = round(med / k, 3)
    print(f"{label:32s} {med/k:8.3f} ms/op  (chain {med:8.1f} ms)", flush=True)


def main():
    cfg = make_config()
    ocfg = cfg.orb
    seq = SyntheticSequence(cfg.camera, n_frames=2)
    _, img = seq.frame(0)
    img_dev = jnp.asarray(img, jnp.uint8)
    img_dev.block_until_ready()

    # Baseline: empty-ish op to measure the readback floor.
    f_nop = jax.jit(lambda x: x + 1)
    chain_time("nop (u8 image add)", f_nop, img_dev)

    # 1. pyramid
    f_pyr = jax.jit(functools.partial(
        pyramid.build_pyramid, n_levels=ocfg.n_levels,
        scale_factor=ocfg.scale_factor))

    def pyr_step(x):
        levels, blurred = f_pyr(x)
        return (levels[0] + blurred[-1][0, 0]).astype(jnp.uint8)
    chain_time("pyramid (8 levels)", pyr_step, img_dev)

    # 2. full extraction
    f_ext = jax.jit(functools.partial(orb_ops.extract_features, cfg=ocfg))
    feat0 = f_ext(img_dev)
    def ext_step(x):
        f = f_ext(x)
        # dependency: xor a feature byte back into the image (cheap)
        return (x ^ f.desc[0, 0].astype(jnp.uint8))
    chain_time("extract_features (full)", ext_step, img_dev)

    # 3. sub-stages of extraction, each over all levels
    from orb_slam_free_space_carving_tpu.ops import orb as orb_mod

    budgets = orb_mod.level_budgets(ocfg.n_features, ocfg.n_levels,
                                    ocfg.scale_factor)

    def mk_stage(kind):
        def stage(x):
            lv, blur = f_pyr(x)
            acc = jnp.zeros((), jnp.float32)
            for l, im in enumerate(lv):
                if kind == "score":
                    sc = fast.fast_score_map(im, float(ocfg.ini_th_fast))
                    acc += sc[0, 0] + sc.max()
                else:
                    xy, score, valid = fast.detect_level(
                        im, capacity=max(8, budgets[l]),
                        ini_threshold=float(ocfg.ini_th_fast),
                        min_threshold=float(ocfg.min_th_fast),
                        cell_size=ocfg.cell_size, border=ocfg.edge_threshold)
                    if kind == "detect":
                        acc += xy.sum() + score.max()
                    elif kind == "detect+orient":
                        ang = orb_mod.compute_orientation(im, xy)
                        acc += ang.sum()
                    elif kind == "detect+desc":
                        ang = orb_mod.compute_orientation(im, xy)
                        d = orb_mod.compute_descriptors(blur[l], xy, ang)
                        acc += d.astype(jnp.float32).sum()
            return (x ^ acc.astype(jnp.uint8))
        return jax.jit(stage)

    chain_time("pyr+FAST score all lv", mk_stage("score"), img_dev)
    chain_time("pyr+detect all lv", mk_stage("detect"), img_dev)
    chain_time("pyr+detect+orient", mk_stage("detect+orient"), img_dev)
    chain_time("pyr+detect+orient+desc", mk_stage("detect+desc"), img_dev)

    # 4. Hamming matmul (matching cost proxy): [32k, 1024] vs [1024]
    M = 32768
    rng = np.random.default_rng(0)
    pt_desc = jnp.asarray(rng.integers(0, 256, (M, 32), np.uint8))
    f_ham = jax.jit(lambda d: matching.hamming_matrix(d, feat0.desc))
    dmat = f_ham(pt_desc[:1024])
    chain_time("hamming 1024x1024",
               lambda x: f_ham(pt_desc[:1024] ^ x[0, 0].astype(jnp.uint8)),
               dmat.astype(jnp.uint8))

    with open("/root/repo/BENCH_FUSED_PARTS.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
