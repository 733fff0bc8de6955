#!/usr/bin/env python
"""Stereo-inertial TUM-VI fisheye replay (reference:
Examples/Stereo-Inertial/stereo_inertial_tum_vi.cc).

Usage:
    python examples/stereo_inertial_tum_vi.py <sequence_dir>
        [--settings cfg.yaml] [--out trajectory_tum.txt]
        [--gt groundtruth.txt] [--max-frames N]

<sequence_dir> is a TUM-VI directory (mav0/cam0 + cam1 + imu0; EuRoC
layout). Both cameras are KannalaBrandt8 fisheye (reference:
Examples/Stereo-Inertial/TUM-VI.yaml); stereo spawning is gated to the
lapping area and triangulates through the KB8 unprojection
(KannalaBrandt8::TriangulateMatches, KannalaBrandt8.h:86-96).
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sequence")
    ap.add_argument("--settings", default=None)
    ap.add_argument("--out", default="trajectory_tum.txt")
    ap.add_argument("--gt", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--viewer", nargs="?", const=8080, type=int,
                    default=None, metavar="PORT",
                    help="serve the live map/frame viewer over HTTP "
                         "(the reference mains' bUseViewer; default port 8080)")
    args = ap.parse_args()

    from openmavis_tpu.io import datasets, evaluation
    from openmavis_tpu.io import settings as cfg_mod
    from openmavis_tpu.pipeline import system

    seq = datasets.load_tumvi(args.sequence, cams=("cam0", "cam1"))
    n = seq.n_frames if args.max_frames <= 0 else min(
        args.max_frames, seq.n_frames)
    print(f"loaded {seq.n_frames} stereo pairs + {len(seq.imu)} IMU "
          f"samples; replaying {n}", file=sys.stderr)

    if args.settings:
        cfg = cfg_mod.load_settings(args.settings)["raw"]
    else:
        cfg = cfg_mod.example_settings(n_cams=2)
        img0 = seq.frame(0)[0]
        cfg["Camera"]["width"] = img0.shape[1]
        cfg["Camera"]["height"] = img0.shape[0]
        # TUM-VI 512 fisheye stereo (reference: Examples/Stereo-Inertial/
        # TUM-VI.yaml): KannalaBrandt8 both cameras, ~10.1 cm baseline
        cfg["Camera"]["type"] = "KannalaBrandt8"
        cfg["Camera1"].update(
            fx=190.978477, fy=190.973307, cx=254.931706, cy=256.897442,
            k1=0.003482389402, k2=0.000715034845,
            k3=-0.002053236141, k4=0.000202936736)
        cfg["Camera2"].update(
            fx=190.287023, fy=190.196358, cx=254.543080, cy=256.986053,
            k1=0.003534823970, k2=0.000792114327,
            k3=-0.002076188347, k4=0.000195590566)
        T = np.eye(4)
        T[0, 3] = 0.101
        cfg["Camera2"]["T_b_c"] = T.tolist()
        cfg["IMU"] = {"NoiseGyro": 0.00016, "NoiseAcc": 0.0028,
                      "GyroWalk": 0.000022, "AccWalk": 0.00086,
                      "Frequency": 200.0}

    slam = system.System(cfg, system.Sensor.IMU_STEREO,
                         use_viewer=args.viewer is not None,
                         viewer_port=args.viewer or 0)
    if slam.viewer is not None:
        print(f"live viewer: {slam.viewer.url}", file=sys.stderr)
    t_prev = None
    t0 = time.perf_counter()
    for i in range(n):
        t = float(seq.cam_times[i])
        imu = (seq.imu_between(t_prev, t) if t_prev is not None
               else np.zeros((0, 7)))
        samples = [(r[1:4], r[4:7], r[0]) for r in imu]
        imgs = seq.frame(i)
        slam.track_stereo(imgs[0], imgs[1], t, imu_samples=samples)
        t_prev = t
    dt = time.perf_counter() - t0
    slam.save_trajectory_tum(args.out)
    print(f"replayed {n} frames in {dt:.1f}s = {n / dt:.1f} fps; "
          f"imu_initialized={slam.tracker.imu_initialized}",
          file=sys.stderr)
    print(f"trajectory -> {args.out}", file=sys.stderr)

    if args.gt:
        traj = np.loadtxt(args.out)
        t_gt, p_gt = evaluation.load_ground_truth(args.gt)
        res = evaluation.ate_rmse(traj[:, 0], traj[:, 1:4], t_gt, p_gt,
                                  with_scale=False)
        print(f"ATE RMSE: {res['rmse']:.4f} m (metric scale)",
              file=sys.stderr)


if __name__ == "__main__":
    main()
