#!/usr/bin/env python
"""Benchmark: end-to-end monocular SLAM tracking throughput on TPU.

Renders a deterministic synthetic sequence (blob world, orbit trajectory),
runs the full pipeline (ORB extraction -> projection matching -> motion-only
pose optimization -> keyframing -> landmark spawning -> window BA), and
reports steady-state tracking frames/second plus trajectory ATE.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": x}
vs_baseline is against the reference's real-time target of 30 fps on CPU
(BASELINE.md: the C++ reference paces its main loop to the dataset rate;
sustained throughput >= 30 fps is its operating point).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from openmavis_tpu.frontend import extractor
    from openmavis_tpu.geometry import cameras
    from openmavis_tpu.io import evaluation, synthetic
    from openmavis_tpu.optim.reprojection import RigParams
    from openmavis_tpu.pipeline import tracking

    W, H = 512, 384
    PIN = np.array([380.0, 380.0, W / 2, H / 2, 0, 0, 0, 0], np.float32)
    rig = RigParams(kind=cameras.PINHOLE, params=jnp.asarray(PIN)[None],
                    R_cb=jnp.eye(3)[None], t_cb=jnp.zeros((1, 3)))

    world = synthetic.BlobWorld.create(seed=3, n=3000)
    n_frames = 40
    R_wc, t_wc = synthetic.orbit_trajectory(n_frames, radius=6.0, frac=0.25)
    frames = synthetic.render_sequence(world, cameras.PINHOLE, PIN,
                                       R_wc, t_wc, W, H)
    frames_dev = [jnp.asarray(f) for f in frames]

    cfg = tracking.TrackerConfig(
        img_w=W, img_h=H,
        orb=extractor.OrbConfig(n_features=512, n_levels=4),
        max_kf=32, max_mp=4096)

    def run():
        tr = tracking.Tracker(rig, cfg, seed=0)
        per_frame = []
        for i, img in enumerate(frames_dev):
            t0 = time.perf_counter()
            tr.process_frame(img, time=i / 20.0)
            jax.block_until_ready(tr.map.mp_pos)
            per_frame.append(time.perf_counter() - t0)
        return tr, per_frame

    run()                      # warm-up: compile everything
    tr, per_frame = run()      # measured pass

    # steady-state: drop init frames; report median frame time
    steady = sorted(per_frame[5:])
    med = steady[len(steady) // 2]
    fps = 1.0 / med

    t_est, _, p_est = tr.get_trajectory()
    res = evaluation.ate_rmse(t_est, p_est, np.arange(n_frames) / 20.0,
                              t_wc, with_scale=True)

    print(json.dumps({
        "metric": "mono_slam_tracking_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": {
            "ate_rmse_m": round(res["rmse"], 4),
            "trajectory_m": 9.42,
            "n_keyframes": tr.n_kf,
            "n_landmarks": int(tr.map.n_mp),
            "median_frame_ms": round(med * 1e3, 2),
        },
    }))


if __name__ == "__main__":
    main()
