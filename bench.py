#!/usr/bin/env python
"""Benchmark: flagship multi-camera visual-inertial SLAM throughput on TPU.

Runs the STREAMING multi-camera VI pipeline (pipeline/streaming_vi.py) at
the reference's flagship feature budget — 4 cameras x 512 ORB features x 8
pyramid levels + 400 Hz IMU (BASELINE.md: Examples/Multi-Inertial/
HiltiChallenge2022.yaml:125-151) — on a deterministic synthetic rig
sequence. The entire per-frame state machine (multi-cam extraction, IMU
preintegration, VI pose optimization, keyframe policy, stereo+temporal
landmark spawning, fusion/culling, VI window BA, staged IMU init) is ONE
device program dispatched once per frame with zero device->host reads.

Protocol: pass 1 warms the compile cache (no host fetch, keeps the axon
transport in its pipelined fast path); pass 2 is timed end-to-end including
per-frame host->device image upload; accuracy + stage microbench follow.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/s", "vs_baseline": x}
vs_baseline is against the reference's real-time operating point of 30 fps
(BASELINE.md: the C++ reference paces its main loop to the dataset rate;
Examples/Multi-Inertial/multi_inertial_euroc.cc:193-202).
"""

import argparse
import json
import time

import numpy as np

W, H = 640, 480
FPS_IN = 20.0
N_FRAMES = 160     # 1.25 orbits: the trajectory self-intersects so the
                   # device-side loop closer must fire inside the timed pass
BASELINE_M = 0.2


def build_rig(kind_name: str = "pinhole"):
    """4-camera rig: front stereo pair + left/right side cameras
    (the Hilti-2022 flagship layout minus the up camera).

    kind_name="kb8" swaps every camera to KannalaBrandt8 fisheye with
    Hilti-like intrinsics (the flagship rig is 4x KB8 fisheye;
    reference: Examples/Multi-Inertial/HiltiChallenge2022.yaml camera
    models + KannalaBrandt8.h:86-96)."""
    from openmavis_tpu.geometry import cameras
    from openmavis_tpu.optim.reprojection import RigParams

    if kind_name == "kb8":
        pin = np.array([352.0, 352.0, W / 2, H / 2,
                        -0.0398, 0.0083, -0.0062, 0.0010], np.float32)
        kind = cameras.KB8
    else:
        pin = np.array([380.0, 380.0, W / 2, H / 2, 0, 0, 0, 0],
                       np.float32)
        kind = cameras.PINHOLE

    def yaw(a):
        c, s = np.cos(a), np.sin(a)
        # camera-from-body rotation for a camera yawed by `a` about body y
        return np.array([[c, 0, -s], [0, 1, 0], [s, 0, c]], np.float32)

    R_cb = np.stack([np.eye(3, dtype=np.float32),
                     np.eye(3, dtype=np.float32),
                     yaw(np.pi / 2), yaw(-np.pi / 2)])
    centers = np.array([[-BASELINE_M / 2, 0, 0], [BASELINE_M / 2, 0, 0],
                        [-0.1, 0, 0], [0.1, 0, 0]], np.float32)
    t_cb = -np.einsum("cij,cj->ci", R_cb, centers)
    params = np.stack([pin] * 4)
    # numpy leaves: the tracker commits the rig to the device in one h2d;
    # the renderer reads the same host copies with zero device traffic
    rig = RigParams(kind=kind, params=params, R_cb=R_cb, t_cb=t_cb)
    rig_np = dict(kind=kind, params=params, R_cb=R_cb, t_cb=t_cb)
    return rig, rig_np


def render_rig_sequence(rig_np, R_wb, t_wb):
    from openmavis_tpu.io import synthetic

    world = synthetic.BlobWorld.create(seed=3, n=4000)
    frames = []
    for c in range(4):
        R_cb = rig_np["R_cb"][c]
        c_b = -R_cb.T @ rig_np["t_cb"][c]
        R_wc = R_wb @ R_cb.T
        t_wc = t_wb + np.einsum("tij,j->ti", R_wb, c_b)
        frames.append(synthetic.render_sequence(
            world, rig_np["kind"], rig_np["params"][c],
            R_wc, t_wc, W, H))
    return np.stack(frames, axis=1).astype(np.float32)  # [T, C, H, W]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=N_FRAMES)
    p.add_argument("--orbit-frac", type=float, default=1.25)
    # the flagship rig is 4x KannalaBrandt8 fisheye (HiltiChallenge2022
    # .yaml; VERDICT r4 #1: the headline must measure the fisheye rig) —
    # kb8 is the default; --kind pinhole remains for ablation
    p.add_argument("--kind", choices=["pinhole", "kb8"],
                   default="kb8")
    # headline slab: 64 KF / 16k landmarks comfortably holds the
    # 160-frame flagship sequence (28 KFs); the map-SCALE artifact is
    # the separate long-sequence run (--frames 1600 --max-kf 256
    # --max-mp 32768 --track-cap 8192, recorded in PERF.md)
    p.add_argument("--max-kf", type=int, default=64)
    p.add_argument("--max-mp", type=int, default=16384)
    # measured r4: chunked dispatch (fpd=8) costs ~3 fps vs per-frame
    # dispatch at identical ATE — the combined one-program-per-frame
    # path already keeps the relay pipelined, so the scan only adds
    # compile complexity. Chunking stays available for transports where
    # per-dispatch overhead dominates.
    p.add_argument("--fpd", type=int, default=1,
                   help="frames per device dispatch")
    p.add_argument("--gba-steps", type=int, default=None,
                   help="amortized post-loop GBA budget (None = default)")
    p.add_argument("--score-min", type=int, default=30)
    p.add_argument("--kf-interval", type=float, default=0.25)
    # pose-opt LM schedule: 2 gating rounds x 6 iters measured
    # ATE-equivalent to the reference-shaped 4x7 on this bench (r5
    # ablations; the chi2 re-gate between rounds converges by round 2
    # with an IMU-predicted warm start) at half the sequential depth
    p.add_argument("--po-rounds", type=int, default=2,
                   help="pose-opt chi2-gating rounds")
    p.add_argument("--po-iters", type=int, default=6,
                   help="LM iterations per pose-opt round")
    p.add_argument("--obs-cap", type=int, default=0,
                   help="whole-map BA observation-table cap "
                        "(0 = auto: 24576 for the default 64-KF slab "
                        "— measured bound-obs count is ~13k — else "
                        "131072)")
    p.add_argument("--temporal-refs", type=int, default=2,
                   help="temporal-spawn reference keyframes per new KF")
    # (3,4) measured ATE-equivalent to (4,6) at ~4 ms/frame less (r5
    # ablation; the window re-solves at every KF, so late iterations
    # refine a linearization the next solve redoes anyway)
    p.add_argument("--ba-stages", default="3,4",
                   help="window-BA LM stage schedule, comma-separated")
    p.add_argument("--track-cap", type=int, default=0,
                   help="local-map landmark cap for per-frame tracking "
                        "(0 = whole map)")
    p.add_argument("--lc-arg", action="append", default=[],
                   help="extra make_lc_step kwargs as key=value "
                        "(repeatable; numbers parsed)")
    p.add_argument("--no-lc", action="store_true")
    p.add_argument("--no-microbench", action="store_true")
    p.add_argument("--mesh", type=int, default=0,
                   help="after the timed pass, run the PRODUCT-PATH "
                        "distributed GBA (StreamingVITracker."
                        "run_global_ba(mesh=N)) over an N-device mesh "
                        "(1 = same path, single device)")
    p.add_argument("--orb-sampling", choices=["patch", "stacked"],
                   default="patch",
                   help="descriptor sampling path (accuracy A/B)")
    p.add_argument("--seed", type=int, default=0,
                   help="tracker RNG seed (RANSAC etc.) — perturb to "
                        "separate systematic accuracy effects from "
                        "single-realization variance")
    p.add_argument("--metric", default="multi_inertial_slam_fps")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from openmavis_tpu.frontend import extractor
    from openmavis_tpu.imu import preintegration as pre_mod
    from openmavis_tpu.io import evaluation, synthetic
    from openmavis_tpu.pipeline import multi_tracking, streaming_vi

    args = parse_args(argv)
    n_frames = args.frames

    rig, rig_np = build_rig(args.kind)
    R_wb, t_wb = synthetic.orbit_trajectory(n_frames, radius=6.0,
                                            frac=args.orbit_frac)
    # uint8 upload: 4x less host->device traffic per frame; the streaming
    # step casts to f32 on device
    frames = np.clip(render_rig_sequence(rig_np, R_wb, t_wb), 0,
                     255).astype(np.uint8)
    dt = 1.0 / FPS_IN
    # 400 Hz IMU (flagship budget): 20 samples per 20 fps frame
    imu = synthetic.imu_from_trajectory(R_wb, t_wb, dt, rate_mult=20)

    orb = extractor.OrbConfig(n_features=512, n_levels=8,
                              sampling=args.orb_sampling)
    # kf cadence/init thresholds chosen so the staged IMU initialization
    # engages INSIDE the timed pass — the benchmark covers the full VI
    # pipeline, not just visual tracking
    cfg = streaming_vi.VIStreamConfig(
        img_w=W, img_h=H, n_cams=4, stereo_pairs=((0, 1),),
        orb=orb, imu_freq=400.0, imu_per_frame=32,
        max_kf=args.max_kf, max_mp=args.max_mp,
        traj_cap=n_frames + 32,
        ba_window=8, imu_init_kfs=6,
        kf_max_interval_s=args.kf_interval,
        temporal_refs=args.temporal_refs,
        frames_per_dispatch=args.fpd,
        track_map_cap=args.track_cap,
        po_rounds=args.po_rounds, po_iters=args.po_iters,
        ba_stages=tuple(int(x) for x in args.ba_stages.split(",")),
        obs_cap=(args.obs_cap if args.obs_cap
                 else (24576 if args.max_kf <= 64 else 131072)),
        # local-map tracking (reference: TrackLocalMap's covisible window,
        # src/Tracking.cc:3396): matching against the WHOLE map would hide
        # drift by continuously re-binding revisited landmarks — realistic
        # at production map sizes the tracker matches a recent window and
        # the loop closer owns the revisit
        local_map_window=10)
    noise = pre_mod.ImuNoise.from_sigmas(1.71e-4, 8.6e-3, 3.1e-6,
                                         2.2e-4, 400.0)

    def batches():
        imu_iter = iter(imu)
        pending = next(imu_iter, None)
        out = []
        for i in range(n_frames):
            t = i * dt
            b = []
            while pending is not None and pending[2] <= t + 1e-9:
                b.append(pending)
                pending = next(imu_iter, None)
            out.append((t, b))
        return out

    frame_imu = batches()
    lc_kw = dict(score_min=args.score_min, temporal=2)
    if args.gba_steps is not None:
        lc_kw["gba_steps"] = args.gba_steps
    for kv in args.lc_arg:
        k, v = kv.split("=", 1)
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        lc_kw[k] = v

    def run():
        # device-side loop closing (pipeline/streaming_lc.py) runs inside
        # the timed pass at keyframe cadence — the benchmark covers the
        # FULL system (reference: the LoopClosing thread is always live,
        # src/LoopClosing.cc:98), not drift-only odometry
        tr = streaming_vi.StreamingVITracker(
            rig, cfg, noise, seed=args.seed,
            device_lc=False if args.no_lc else lc_kw)
        for i in range(n_frames):
            t, b = frame_imu[i]
            tr.push(frames[i], t, b)
        tr.block()
        return tr

    import os
    load_before = os.getloadavg()[0]
    tr0 = run()                # pass 1: compile (no host fetch)
    # Timing protocol (round 5): `block()` through the axon relay is
    # acknowledged speculatively, and when the per-frame programs are
    # small enough the ENTIRE stream fits in the relay queue — the
    # enqueue loop then returns in enqueue time (measured 1.8 ms/frame)
    # with the device still computing. The only sync that provably
    # waits for all enqueued compute is a d2h fetch (program order), so
    # the timed region runs through the snapshot fetch and subtracts
    # the fetch's own (compute-idle) cost measured after pass 1.
    # the FIRST d2h of the process goes down the transport's slow path
    # (PERF.md: 60-370 s cold) — fetch twice and take the min so
    # idle_fetch measures the warmed fetch the timed pass will see
    tf0 = time.perf_counter()
    tr0.snapshot()
    idle_fetch = time.perf_counter() - tf0
    tr0._snap = None
    tf0 = time.perf_counter()
    tr0.snapshot()
    idle_fetch = min(idle_fetch, time.perf_counter() - tf0)
    t0 = time.perf_counter()
    tr = run()                 # pass 2: timed, streaming
    t_enqueue = time.perf_counter() - t0
    snap = tr.snapshot()       # completion-proving fetch
    # floor at the enqueue time: the stream cannot have completed
    # faster than it was fed, so fetch-cost variance (shared host) can
    # never push the estimate below the enqueue-bound lower limit
    elapsed = max(time.perf_counter() - t0 - idle_fetch, t_enqueue)
    fps = n_frames / elapsed
    load_after = os.getloadavg()[0]

    mesh_extra = {}
    if args.mesh > 0:
        # product-path distributed GBA over the streamed map (the same
        # entry System.run_global_ba(mesh=...) uses; VERDICT r4 #3)
        t0 = time.perf_counter()
        chi_mesh = tr.run_global_ba(mesh=args.mesh)
        mesh_extra = {"mesh_devices": args.mesh,
                      "mesh_gba_chi2": round(float(chi_mesh), 3),
                      "mesh_gba_s": round(time.perf_counter() - t0, 2)}

    # accuracy + counters reuse the completion fetch (cached)
    t_est, _, p_est = tr.get_trajectory()
    ok = snap["ok"][:len(t_est)]
    t_gt = np.arange(n_frames) * dt
    res = evaluation.ate_rmse(t_est[ok], p_est[ok], t_gt, t_wb,
                              with_scale=True)
    path_len = float(np.linalg.norm(np.diff(t_wb, axis=0),
                                    axis=1).sum())

    # -- stage microbench (VERDICT r1 #9: publish where the ms go) --------
    from openmavis_tpu.utils import device as dev

    def timeit(f, *fargs, reps=20):
        with dev.host_trace():
            out = f(*fargs)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(*fargs)
            jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1e3

    stage_ms = {}
    if not args.no_microbench:
        img_dev = dev.commit(frames[-1].astype(np.float32))
        ext_jit = jax.jit(lambda im: extractor.extract_multicam(im, orb))
        stage_ms["extract_4cam_8lvl"] = round(timeit(ext_jit, img_dev), 2)

        from openmavis_tpu.optim import pose_opt
        with dev.host_trace():
            feats = ext_jit(img_dev)
            bank = multi_tracking.concat_bands(feats)
        c = tr.carry
        anchor = pose_opt.InertialState(R=c.R, p=c.p, v=c.v, bg=c.bg,
                                        ba=c.ba)
        with dev.host_trace():
            pre_f = pre_mod.init_preintegrated(
                jnp.concatenate([c.bg, c.ba]))

        track_jit = jax.jit(
            lambda m, bank, anchor, pre_f, rig:
            multi_tracking.track_step_multi_vi(
                m, bank, anchor, anchor, pre_f, rig.kind, 4, rig,
                float(W), float(H), cfg.match_radius, -1))
        stage_ms["track_vi_pose_opt"] = round(
            timeit(track_jit, tr.map, bank, anchor, pre_f, tr.rig), 2)

    print(json.dumps({
        "metric": args.metric,
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
        "extra": {
            "budget": f"4 cams ({args.kind}) x 512 feats x 8 levels + "
                      f"400 Hz IMU, {W}x{H}",
            "ate_rmse_m": round(float(res["rmse"]), 4),
            "ate_rmse_noscale_m": round(float(res["rmse_noscale"]), 4),
            "horn_scale": round(float(res["scale"]), 4),
            "trajectory_m": round(path_len, 2),
            "frames_tracked": int(ok.sum()),
            "n_keyframes": int(snap["n_kf"]),
            "n_landmarks": int(snap["n_mp"]),
            "n_obs": int(snap.get("n_obs", -1)),
            "imu_initialized": bool(snap["imu_ok"]),
            "viba_stage": int(snap["viba_stage"]),
            "loop_closures": int(snap.get("n_loops", 0)),
            "lc_max_tilt_rad": round(float(snap.get("lc_max_tilt",
                                                    0.0)), 4),
            # [best score, floor@best, attempts, max pairs, solve oks,
            # max group score] — which LC gate binds (streaming_lc)
            "lc_stage_max": [round(float(x), 1) for x in
                             np.asarray(snap.get("lc_dbg",
                                                 np.zeros(6)))],
            "mean_frame_ms": round(elapsed / n_frames * 1e3, 2),
            # host contention marker (VERDICT r4: fps deltas < ~15% are
            # unreadable without it — the tunneled chip's host is shared)
            "loadavg": [round(load_before, 2), round(load_after, 2)],
            "idle_fetch_s": round(idle_fetch, 2),
            "stage_ms": stage_ms,
            **mesh_extra,
        },
    }))


if __name__ == "__main__":
    main()
