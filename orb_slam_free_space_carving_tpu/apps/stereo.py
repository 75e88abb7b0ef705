"""Stereo dataset drivers.

Mirrors the reference stereo examples (``Examples/Stereo/stereo_kitti.cc``,
``stereo_euroc.cc``): load paired image lists, construct the System, feed
frames with optional real-time pacing, print timing stats, save the KITTI /
TUM trajectories, export the carved mesh + transcript.

Usage:
    python -m orb_slam_free_space_carving_tpu.apps.stereo \
        --dataset kitti --sequence /data/kitti/sequences/00 \
        --settings KITTI00-02.yaml --out-dir ./out

    python -m orb_slam_free_space_carving_tpu.apps.stereo --dataset synthetic
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=["kitti", "euroc", "synthetic"],
                    required=True)
    ap.add_argument("--sequence")
    ap.add_argument("--settings")
    ap.add_argument("--timestamps", help="EuRoC timestamp list file")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--realtime", action="store_true")
    ap.add_argument("--no-carve", action="store_true")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))

    import numpy as np

    from orb_slam_free_space_carving_tpu.config import load_settings
    from orb_slam_free_space_carving_tpu.models.system import System
    from orb_slam_free_space_carving_tpu.models import tracking as trk
    from orb_slam_free_space_carving_tpu.utils import datasets

    baseline = 0.1
    if args.dataset == "synthetic":
        from orb_slam_free_space_carving_tpu.config import (
            CameraConfig, ORBConfig, SystemConfig,
        )
        from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

        cfg = SystemConfig(
            camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                                width=320, height=240, bf=260.0 * baseline),
            orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
            sensor="stereo",
        )
        synth = SyntheticSequence(cfg.camera, n_frames=args.frames or 60)

        class _Seq:
            def __len__(self):
                return len(synth)

            def frame(self, i):
                return synth.stereo_frame(i, baseline)

        seq = _Seq()
    else:
        cfg = load_settings(args.settings, sensor="stereo")
        if args.dataset == "kitti":
            seq = datasets.load_kitti_stereo(args.sequence)
        else:
            seq = datasets.load_euroc_stereo(args.sequence, args.timestamps)

    sysm = System(cfg, sensor="stereo", enable_carving=not args.no_carve,
                  enable_loop_closing=not args.no_loop)

    n = len(seq)
    if args.frames:
        n = min(n, args.frames)
    print(f"Tracking {n} stereo frames ({args.dataset})...")
    track_times = []
    t_prev = None
    for i in range(n):
        ts, img_l, img_r = seq.frame(i)
        t0 = time.perf_counter()
        sysm.track_stereo(img_l, img_r, ts)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if args.realtime and t_prev is not None and dt < ts - t_prev:
            time.sleep(ts - t_prev - dt)
        t_prev = ts
        if i % 50 == 0:
            print(f"  frame {i}/{n} state={sysm.get_tracking_state()} "
                  f"tracked={sysm.get_tracked_points()} "
                  f"kfs={int(sysm.map_host.kf_valid.sum())}")
    sysm.shutdown()

    tt = np.sort(np.array(track_times))
    print(f"median tracking time: {np.median(tt)*1e3:.1f} ms")
    print(f"mean tracking time:   {tt.mean()*1e3:.1f} ms")

    os.makedirs(args.out_dir, exist_ok=True)
    sysm.save_keyframe_trajectory_tum(
        os.path.join(args.out_dir, "KeyFrameTrajectory.txt"))
    from orb_slam_free_space_carving_tpu.utils import trajectory

    ts_arr, poses, states = sysm.frame_trajectory()
    if args.dataset == "kitti":
        trajectory.save_trajectory_kitti(
            os.path.join(args.out_dir, "Trajectory_KITTI.txt"), poses)
    else:
        sysm.save_trajectory_tum(os.path.join(args.out_dir, "Trajectory.txt"))
    if sysm.carver is not None:
        sysm.save_mesh_obj(os.path.join(args.out_dir, "model.obj"))
        sysm.carver.write_transcript(
            os.path.join(args.out_dir, "sfmtranscript_orbslam.txt"))

    if args.dataset == "synthetic":
        from orb_slam_free_space_carving_tpu.utils import lie
        import jax.numpy as jnp

        ok = states == trk.OK
        if ok.sum() > 10:
            est = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
            ate = trajectory.ate_rmse(est, synth.gt_positions()[:n][ok],
                                      with_scale=False)
            print(f"ATE RMSE (metric, no scale alignment): {ate:.4f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())
