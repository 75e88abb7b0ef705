"""ATE under photometric degradation — the committed real-dataset proxy
(VERDICT r2 #8): since the sandbox cannot fetch TUM/KITTI, measure how the
pipeline degrades under the real-camera effects the clean renderer lacks
(sensor noise, auto-exposure drift, motion blur, vignetting).

Writes ATE_NOISE.json: {level: {ate_m, tracked_frac, n_keyframes}}.
Run on CPU (deterministic pipeline): JAX_PLATFORMS handled internally.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", os.environ.get("OSFSC_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir", "/tmp/osfsc_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np

LEVELS = {
    "clean": None,
    "mild": dict(noise_sigma=4.0, exposure_amp=0.12, blur_px=1, vignette=0.2),
    "harsh": dict(noise_sigma=10.0, exposure_amp=0.30, blur_px=2, vignette=0.4),
}


def run_level(name, spec, n=80):
    import jax.numpy as jnp

    from orb_slam_free_space_carving_tpu.config import (
        CameraConfig, CapacityConfig, ORBConfig, SystemConfig,
    )
    from orb_slam_free_space_carving_tpu.models import tracking as trk
    from orb_slam_free_space_carving_tpu.models.system import System
    from orb_slam_free_space_carving_tpu.utils import lie
    from orb_slam_free_space_carving_tpu.utils.synthetic import (
        Degrade, SyntheticSequence,
    )
    from orb_slam_free_space_carving_tpu.utils.trajectory import ate_rmse

    cfg = SystemConfig(
        camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                            width=320, height=240),
        orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
        capacity=CapacityConfig(
            max_keyframes=64, max_points=16384,
            local_ba_window=8, local_ba_fixed=4,
            local_ba_points=4096, local_ba_obs=8192, gba_obs=16384,
        ),
        deterministic=True,
    )
    seq = SyntheticSequence(
        cfg.camera, n_frames=n,
        degrade=Degrade(**spec) if spec else None,
    )
    sysm = System(cfg, enable_carving=False)
    for ts, img in seq:
        sysm.track_monocular(img, ts)
    sysm.shutdown()
    ts, poses, states = sysm.frame_trajectory()
    ok = states == trk.OK
    out = {"tracked_frac": round(float(ok.mean()), 3),
           "n_keyframes": int(sysm.map_host.kf_valid.sum())}
    if ok.sum() >= 10:
        est = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
        gt = seq.gt_positions()[ok]
        out["ate_m"] = round(float(ate_rmse(est, gt, with_scale=True)), 4)
    else:
        out["ate_m"] = None
    print(name, out, flush=True)
    return out


def main():
    results = {}
    for name, spec in LEVELS.items():
        results[name] = run_level(name, spec)
    path = os.path.join(os.path.dirname(__file__), "..", "ATE_NOISE.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
