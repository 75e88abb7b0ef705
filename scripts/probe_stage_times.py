"""Per-program device-time probe at bench shapes.

Times each hot jitted program steady-state (block_until_ready after warm)
at the exact shapes bench.py uses, to find where the TPU device time goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def t_of(fn, *args, n=5, **kw):
    r = fn(*args, **kw)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args, **kw)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import make_config
    from orb_slam_free_space_carving_tpu.models import map_state as ms
    from orb_slam_free_space_carving_tpu.models import tracking as trk
    from orb_slam_free_space_carving_tpu.models import local_mapping as lm
    from orb_slam_free_space_carving_tpu.ops import carving
    from orb_slam_free_space_carving_tpu.utils import camera

    cfg = make_config()
    print("platform:", jax.devices()[0].platform)
    rng = np.random.default_rng(0)
    m = ms.empty_map_arrays(cfg)
    K = cfg.capacity.max_keyframes
    M = cfg.capacity.max_points
    N0 = cfg.orb.n_features_pad
    intr = camera.intrinsics_array(cfg.camera)
    img = jnp.asarray(rng.integers(0, 255, (cfg.camera.height,
                                            cfg.camera.width), np.uint8))

    # populate plausible map content
    m = m._replace(
        pt_xyz=jnp.asarray(rng.normal(0, 1, (M, 3)).astype(np.float32)),
        pt_desc=jnp.asarray(rng.integers(0, 256, (M, 32), np.uint8)),
        pt_valid=jnp.asarray(rng.random(M) < 0.2),
        kf_desc=jnp.asarray(rng.integers(0, 256, (K, N0, 32), np.uint8)),
        kf_uv=jnp.asarray(rng.uniform(0, 640, (K, N0, 2)).astype(np.float32)),
        kf_octave=jnp.asarray(rng.integers(0, 8, (K, N0), np.int32)),
        kf_feat_valid=jnp.ones((K, N0), bool),
        obs_pt=jnp.asarray(rng.integers(-1, M, (K, N0), np.int32)),
    )

    # 1. fused track step
    last_pose = jnp.asarray([1, 0, 0, 0, 0, 0, 0], jnp.float32)
    vel = last_pose
    last_tp = jnp.asarray(rng.integers(-1, M, N0).astype(np.int32))
    last_oct = jnp.asarray(rng.integers(0, 8, N0).astype(np.int32))
    lids = jnp.asarray(rng.integers(0, M, trk.LOCAL_POINTS_CAP).astype(np.int32))
    lmask = jnp.ones(trk.LOCAL_POINTS_CAP, bool)
    is2 = jnp.asarray(1.0 / np.array(cfg.orb.level_sigma2, np.float32))
    ctr_v = jnp.zeros(M, jnp.int32)
    ctr_f = jnp.zeros(M, jnp.int32)

    def fused():
        return trk._fused_track_step(
            m, img, last_pose, vel, last_tp, last_oct, lids, lmask, intr,
            is2, ctr_v, ctr_f, cfg.orb, cfg.orb.scale_factor,
            cfg.orb.n_levels, (cfg.camera.width, cfg.camera.height),
            cfg.matcher.search_radius_motion, cfg.camera.has_distortion,
            opt_cfg=cfg.optimizer,
        )

    print(f"fused_track_step:  {t_of(fused)*1e3:8.1f} ms")

    # 2. extraction alone
    from orb_slam_free_space_carving_tpu.ops import orb as orb_ops

    ext = jax.jit(lambda im: orb_ops.extract_features(im, cfg.orb))
    print(f"extract_features:  {t_of(ext, img)*1e3:8.1f} ms")

    # 3. local BA at caps
    C = cfg.capacity.local_ba_window + cfg.capacity.local_ba_fixed
    P = cfg.capacity.local_ba_points
    O = cfg.capacity.local_ba_obs
    cam_poses = np.tile(np.array([1, 0, 0, 0, 0, 0, 0], np.float32), (C, 1))
    cam_poses[:, 4] = rng.normal(0, 0.1, C)
    pts = rng.normal(0, 1, (P, 3)).astype(np.float32)
    pts[:, 2] += 4
    obs_cam = rng.integers(0, C, O).astype(np.int32)
    obs_pt = rng.integers(0, P, O).astype(np.int32)
    obs_uv = rng.uniform(0, 480, (O, 2)).astype(np.float32)

    def ba_run():
        return lm._local_ba(
            jnp.asarray(cam_poses), jnp.ones(C, bool), jnp.asarray(pts),
            jnp.ones(P, bool), jnp.asarray(obs_cam), jnp.asarray(obs_pt),
            jnp.asarray(obs_uv), jnp.ones(O, jnp.float32),
            jnp.ones(O, bool), intr, 15,
        )

    print(f"local_ba (15 it):  {t_of(ba_run)*1e3:8.1f} ms")

    # 4. triangulation batch NB
    NB = cfg.mapping.triangulation_neighbors
    nb_idx = jnp.asarray(rng.integers(0, K, NB).astype(np.int32))

    words = jnp.asarray(rng.integers(0, 4096, N0).astype(np.int32))
    words_b = jnp.asarray(rng.integers(0, 4096, (NB, N0)).astype(np.int32))

    def tri_run():
        return lm._epipolar_triangulate_batch(
            m.kf_pose[0], m.kf_pose[nb_idx],
            m.kf_uv[0], m.kf_octave[0], m.kf_angle[0], m.kf_desc[0],
            jnp.ones(N0, bool), words,
            m.kf_uv[nb_idx], m.kf_octave[nb_idx], m.kf_angle[nb_idx],
            m.kf_desc[nb_idx], jnp.ones((NB, N0), bool), words_b, intr, is2,
        )

    print(f"triangulate x{NB}:  {t_of(tri_run)*1e3:8.1f} ms")

    # 5. fuse batch
    ids = jnp.asarray(rng.integers(0, M, N0).astype(np.int32))

    def fuse_run():
        return lm._fuse_project_batch(
            m.kf_pose[nb_idx], m.pt_xyz[ids], m.pt_desc[ids],
            jnp.ones(N0, bool), m.pt_max_dist[ids], m.pt_normal[ids],
            m.kf_uv[nb_idx], m.kf_octave[nb_idx], m.kf_desc[nb_idx],
            m.kf_feat_valid[nb_idx], jnp.ones((NB, N0), bool), intr,
            cfg.orb.scale_factor, cfg.orb.n_levels,
            (cfg.camera.width, cfg.camera.height),
        )

    print(f"fuse x{NB}:         {t_of(fuse_run)*1e3:8.1f} ms")

    # 6. update_point_stats
    def ups():
        return ms.update_point_stats(
            m, scale_factor=cfg.orb.scale_factor, n_levels=cfg.orb.n_levels,
            refresh_desc=True, medoid_cap=cfg.capacity.max_obs_per_point,
        )

    print(f"update_point_stats:{t_of(ups)*1e3:8.1f} ms")

    # 7. carve at R
    R = cfg.carving.grid_resolution
    B = 4096
    orig = jnp.asarray(rng.normal(0, 1, (B, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(0, 2, (B, 3)).astype(np.float32))
    mask = jnp.ones(B, bool)
    lo = jnp.asarray([-4, -4, -4], jnp.float32)
    hi = jnp.asarray([4, 4, 4], jnp.float32)

    def cv():
        return carving.carve_votes(orig, tgt, mask, lo, hi, resolution=R,
                                   n_samples=cfg.carving.ray_samples)

    print(f"carve_votes 4096:  {t_of(cv)*1e3:8.1f} ms")

    def mrf():
        v, e = cv()
        return carving.mrf_relax(v, e, iterations=16)

    print(f"mrf_relax 16it:    {(t_of(mrf) - t_of(cv))*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
