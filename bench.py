#!/usr/bin/env python
"""Benchmark: end-to-end monocular SLAM tracking throughput on TPU.

Renders a deterministic synthetic sequence (blob world, orbit trajectory)
and runs the STREAMING pipeline (pipeline/streaming.py): the entire
per-frame state machine — ORB extraction, two-view init, projection
matching, motion-only pose optimization, keyframe policy, landmark
spawning/fusion/culling and window BA — is one device program, dispatched
once per frame with zero device->host reads. The trajectory is fetched
once at the end for the accuracy check.

Protocol: pass 1 warms the compile cache (no host fetch, keeps the
transport in its pipelined fast path); pass 2 is timed end-to-end including
per-frame host->device image upload; ATE is computed afterwards.

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
    from openmavis_tpu.pipeline import streaming

    W, H = 512, 384
    PIN = np.array([380.0, 380.0, W / 2, H / 2, 0, 0, 0, 0], np.float32)
    rig = RigParams(kind=cameras.PINHOLE, params=jnp.asarray(PIN)[None],
                    R_cb=jnp.eye(3)[None], t_cb=jnp.zeros((1, 3)))

    world = synthetic.BlobWorld.create(seed=3, n=3000)
    n_frames = 40
    R_wc, t_wc = synthetic.orbit_trajectory(n_frames, radius=6.0, frac=0.25)
    frames = synthetic.render_sequence(world, cameras.PINHOLE, PIN,
                                       R_wc, t_wc, W, H)
    frames = [np.asarray(f, np.float32) for f in frames]

    cfg = streaming.StreamConfig(
        img_w=W, img_h=H,
        orb=extractor.OrbConfig(n_features=512, n_levels=4),
        max_kf=32, max_mp=4096, traj_cap=64)

    def run():
        tr = streaming.StreamingTracker(rig, cfg, seed=0)
        for i, img in enumerate(frames):
            tr.push(jnp.asarray(img), i / 20.0)
        tr.block()
        return tr

    run()                      # pass 1: compile (no host fetch)
    t0 = time.perf_counter()
    tr = run()                 # pass 2: timed, streaming
    elapsed = time.perf_counter() - t0
    fps = n_frames / elapsed

    # accuracy: single fetch AFTER timing
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
            "mean_frame_ms": round(elapsed / n_frames * 1e3, 2),
        },
    }))


if __name__ == "__main__":
    main()
