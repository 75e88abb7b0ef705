"""Monocular dataset drivers.

Mirrors the reference example binaries (``Examples/Monocular/mono_tum.cc``,
``mono_kitti.cc``, ``mono_euroc.cc``): load an image list, construct the
System, feed frames with optional real-time pacing, print per-frame timing
stats, save trajectories, and (new capability) export the carved mesh +
transcript.

Usage:
    python -m orb_slam_free_space_carving_tpu.apps.mono \
        --dataset tum --sequence /data/rgbd_dataset_freiburg1_xyz \
        --settings TUM1.yaml --out-dir ./out [--realtime] [--no-carve]

    python -m orb_slam_free_space_carving_tpu.apps.mono \
        --dataset kitti --sequence /data/kitti/sequences/00 --settings KITTI00-02.yaml

    python -m orb_slam_free_space_carving_tpu.apps.mono \
        --dataset euroc --sequence /data/euroc/MH_01 \
        --timestamps ts.txt --settings EuRoC.yaml

    python -m orb_slam_free_space_carving_tpu.apps.mono --dataset synthetic
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=["tum", "kitti", "euroc", "synthetic"],
                    required=True)
    ap.add_argument("--sequence", help="dataset sequence directory")
    ap.add_argument("--settings", help="reference-format YAML settings file")
    ap.add_argument("--timestamps", help="EuRoC timestamp list file")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--realtime", action="store_true",
                    help="pace frames to their timestamps (mono_tum.cc:97-105)")
    ap.add_argument("--no-carve", action="store_true")
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--frames", type=int, default=0, help="limit frame count")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
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

    if args.dataset == "synthetic":
        from orb_slam_free_space_carving_tpu.config import (
            CameraConfig, ORBConfig, SystemConfig,
        )

        cfg = SystemConfig(
            camera=CameraConfig(fx=260.0, fy=260.0, cx=160.0, cy=120.0,
                                width=320, height=240),
            orb=ORBConfig(n_features=800, n_levels=4, n_features_pad=1024),
        )
        from orb_slam_free_space_carving_tpu.utils.synthetic import SyntheticSequence

        seq = SyntheticSequence(cfg.camera, n_frames=args.frames or 60)
    else:
        cfg = load_settings(args.settings, sensor="monocular")
        if args.dataset == "tum":
            seq = datasets.load_tum_mono(args.sequence)
        elif args.dataset == "kitti":
            seq = datasets.load_kitti_mono(args.sequence)
        else:
            seq = datasets.load_euroc_mono(args.sequence, args.timestamps)

    sysm = System(cfg, enable_carving=not args.no_carve,
                  enable_loop_closing=not args.no_loop)

    n = len(seq)
    if args.frames:
        n = min(n, args.frames)
    print(f"Tracking {n} frames ({args.dataset})...")
    track_times = []
    t_prev = None
    for i in range(n):
        ts, img = seq.frame(i)
        t0 = time.perf_counter()
        sysm.track_monocular(img, ts)
        dt = time.perf_counter() - t0
        track_times.append(dt)
        if args.realtime and t_prev is not None:
            budget = ts - t_prev
            if dt < budget:
                time.sleep(budget - dt)
        t_prev = ts
        if i % 50 == 0:
            print(f"  frame {i}/{n} state={sysm.get_tracking_state()} "
                  f"tracked={sysm.get_tracked_points()} "
                  f"kfs={int(sysm.map_host.kf_valid.sum())}")
    sysm.shutdown()

    # Per-frame timing stats (mono_tum.cc:112-120).
    tt = np.sort(np.array(track_times))
    print(f"median tracking time: {np.median(tt)*1e3:.1f} ms")
    print(f"mean tracking time:   {tt.mean()*1e3:.1f} ms")

    os.makedirs(args.out_dir, exist_ok=True)
    kf_path = os.path.join(args.out_dir, "KeyFrameTrajectory.txt")
    sysm.save_keyframe_trajectory_tum(kf_path)
    print(f"keyframe trajectory -> {kf_path}")
    if args.dataset == "kitti":
        from orb_slam_free_space_carving_tpu.utils import trajectory

        ts_arr, poses, states = sysm.frame_trajectory()
        trajectory.save_trajectory_kitti(
            os.path.join(args.out_dir, "Trajectory_KITTI.txt"), poses)
    else:
        sysm.save_trajectory_tum(os.path.join(args.out_dir, "Trajectory.txt"))
    if sysm.carver is not None:
        mesh_path = os.path.join(args.out_dir, "model.obj")
        sysm.save_mesh_obj(mesh_path)
        sysm.carver.write_transcript(
            os.path.join(args.out_dir, "sfmtranscript_orbslam.txt"))
        nv = 0 if sysm.carver.vertices is None else len(sysm.carver.vertices)
        print(f"carved mesh ({nv} verts) -> {mesh_path}")

    if args.dataset == "synthetic":
        from orb_slam_free_space_carving_tpu.utils import lie, trajectory
        import jax.numpy as jnp

        ts_arr, poses, states = sysm.frame_trajectory()
        ok = states == trk.OK
        if ok.sum() > 10:
            est = np.asarray(lie.se3_inverse(jnp.asarray(poses[ok])))[:, 4:7]
            ate = trajectory.ate_rmse(est, seq.gt_positions()[: n][ok],
                                      with_scale=True)
            print(f"ATE RMSE (scale-aligned): {ate:.4f} m")
    return 0


if __name__ == "__main__":
    sys.exit(main())
