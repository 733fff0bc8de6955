#!/usr/bin/env python
"""On-device TPU smoke test: validates every TPU-only code path in one
clean process with ONE final d2h fetch.

Covers (VERDICT r2 "next" #2): the Pallas fused matcher at small and
flagship shapes vs the XLA path, transport characteristics (dispatch /
ready-wait / fetch latency), and a miniature streaming-VI run (extract ->
match -> pose-opt -> stereo_spawn inside the fused step).

Run:  python scripts/tpu_smoke.py            (~ a few minutes through the
tunneled transport; most of it is the single final fetch)

Prints one JSON line per stage (flushed immediately, so a hang is
attributable), then `SMOKE OK` / `SMOKE FAIL`.
"""

import json
import sys
import time

import numpy as np

T0 = time.perf_counter()


def log(stage, **kw):
    print(json.dumps({"stage": stage,
                      "t": round(time.perf_counter() - T0, 2), **kw}),
          flush=True)


def main():
    log("import_jax")
    import jax
    import jax.numpy as jnp
    tpu = jax.devices()[0]
    log("devices", backend=jax.default_backend(), dev=str(tpu))

    sys.path.insert(0, ".")
    from openmavis_tpu.frontend import matcher, matcher_pallas
    from openmavis_tpu.utils import device as dev

    results = {}   # device scalars fetched once at the end
    rng = np.random.RandomState(0)

    # ---- 1. ready-wait honesty: chained matmuls ------------------------
    a = jax.device_put(rng.rand(2048, 2048).astype(np.float32), tpu)

    @jax.jit
    def chain(x):
        for _ in range(64):
            x = x @ x * 1e-3
        return x

    with dev.host_trace():
        y = chain(a)
    y.block_until_ready()
    t0 = time.perf_counter()
    y2 = chain(y)
    y2.block_until_ready()
    warm_ms = (time.perf_counter() - t0) * 1e3
    # 64 matmuls x 17.2 GFLOP = 1.1 TFLOP; v5e ~ 200 TF/s bf16, f32 ~ 50
    log("matmul_chain", warm_ms=round(warm_ms, 1),
        tflops=round(64 * 2 * 2048**3 / warm_ms / 1e9, 1))

    # ---- 2. Pallas fused matcher vs XLA path, small + flagship ---------
    for tag, (n, m) in (("small", (512, 1024)),
                        ("flagship", (2048, 16384))):
        d1 = (rng.rand(n, 256) > .5).astype(np.int8)
        d2 = (rng.rand(m, 256) > .5).astype(np.int8)
        keep = rng.rand(n, m) > 0.3           # random admissibility mask
        a1, a2 = jax.device_put(d1, tpu), jax.device_put(d2, tpu)
        am = jax.device_put(keep, tpu)

        @jax.jit
        def compare(a1, a2, am):
            with dev.host_trace():
                pen = jnp.where(am, 0.0, 2.0 * matcher_pallas.INVALID)
                bi_p, b_p, s_p = matcher_pallas.masked_best2_fused(
                    a1, a2, pen)
                dist = matcher.hamming_matrix(a1, a2)
                bi_x, b_x, s_x = matcher.masked_best2(dist, am)
                has = b_x < matcher_pallas.INVALID
                mism = (jnp.sum((bi_p != bi_x) & has)
                        + jnp.sum(jnp.where(has, b_p != b_x, b_p < 300))
                        + jnp.sum((s_p != s_x) & (s_x < 300)))
                return mism

        t0 = time.perf_counter()
        mism = compare(a1, a2, am)
        mism.block_until_ready()
        log(f"pallas_{tag}", n=n, m=m,
            compile_run_s=round(time.perf_counter() - t0, 2))
        t0 = time.perf_counter()
        mism = compare(a1, a2, am)
        mism.block_until_ready()
        log(f"pallas_{tag}_warm", ms=round((time.perf_counter() - t0)
                                           * 1e3, 1))
        results[f"pallas_mismatch_{tag}"] = mism

    # ---- 3. miniature streaming-VI pipeline ----------------------------
    from openmavis_tpu.frontend import extractor
    from openmavis_tpu.geometry import cameras
    from openmavis_tpu.imu import preintegration as pre_mod
    from openmavis_tpu.io import synthetic
    from openmavis_tpu.optim.reprojection import RigParams
    from openmavis_tpu.pipeline import streaming_vi

    W, H, NF = 256, 192, 8
    pin = np.array([200.0, 200.0, W / 2, H / 2, 0, 0, 0, 0], np.float32)
    R_cb = np.stack([np.eye(3, dtype=np.float32)] * 2)
    centers = np.array([[-0.1, 0, 0], [0.1, 0, 0]], np.float32)
    t_cb = -np.einsum("cij,cj->ci", R_cb, centers)
    rig = RigParams(kind=cameras.PINHOLE,
                    params=np.stack([pin] * 2), R_cb=R_cb, t_cb=t_cb)
    world = synthetic.BlobWorld.create(seed=3, n=1200)
    R_wb, t_wb = synthetic.orbit_trajectory(NF, radius=5.0, frac=0.1)
    frames = []
    for c in range(2):
        cb = -R_cb[c].T @ t_cb[c]
        R_wc = R_wb @ R_cb[c].T
        t_wc = t_wb + np.einsum("tij,j->ti", R_wb, cb)
        frames.append(synthetic.render_sequence(
            world, cameras.PINHOLE, pin, R_wc, t_wc, W, H))
    frames = np.clip(np.stack(frames, 1), 0, 255).astype(np.uint8)
    dt = 0.05
    imu = synthetic.imu_from_trajectory(R_wb, t_wb, dt, rate_mult=10)

    cfg = streaming_vi.VIStreamConfig(
        img_w=W, img_h=H, n_cams=2, stereo_pairs=((0, 1),),
        orb=extractor.OrbConfig(n_features=128, n_levels=4),
        imu_freq=200.0, imu_per_frame=16, max_kf=16, max_mp=1024,
        traj_cap=32, ba_window=4, imu_init_kfs=4,
        kf_max_interval_s=0.1, temporal_refs=1, min_rig_landmarks=20)
    noise = pre_mod.ImuNoise.from_sigmas(1.7e-4, 2e-3, 1.9e-5, 3e-3,
                                         200.0)
    t0 = time.perf_counter()
    tr = streaming_vi.StreamingVITracker(rig, cfg, noise, seed=0)
    log("tracker_alloc", s=round(time.perf_counter() - t0, 2))

    imu_iter = iter(imu)
    pending = next(imu_iter, None)
    t0 = time.perf_counter()
    for i in range(NF):
        t = i * dt
        b = []
        while pending is not None and pending[2] <= t + 1e-9:
            b.append(pending)
            pending = next(imu_iter, None)
        tr.push(frames[i], t, b)
        if i == 0:
            tr.block()
            log("first_step_compile", s=round(time.perf_counter() - t0,
                                              2))
            t0 = time.perf_counter()
    tr.block()
    steps_s = time.perf_counter() - t0
    log("stream_7_frames", s=round(steps_s, 2),
        ms_per_frame=round(steps_s / (NF - 1) * 1e3, 1))

    # ---- 4. the single fetch -------------------------------------------
    t0 = time.perf_counter()
    snap = tr.snapshot()
    fetch1_s = time.perf_counter() - t0
    log("snapshot_fetch", s=round(fetch1_s, 2),
        n_kf=int(snap["n_kf"]), n_mp=int(snap["n_mp"]),
        frames_ok=int(snap["ok"].sum()))
    t0 = time.perf_counter()
    res_host = dev.Packer().fetch(results)
    fetch2_s = time.perf_counter() - t0
    log("second_fetch", s=round(fetch2_s, 2),
        **{k: int(v) for k, v in res_host.items()})

    ok = (all(int(v) == 0 for v in res_host.values())
          and int(snap["n_kf"]) >= 2 and int(snap["ok"].sum()) >= NF - 2)
    print("SMOKE OK" if ok else "SMOKE FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
