#!/usr/bin/env python
"""Round-4 verification driver (real TPU, axon platform).

Drives the changed surfaces end-to-end on device:
1. reference-yaml settings ingestion (HiltiChallenge2022.yaml verbatim)
   -> KB8 rig arrays;
2. the patch-extraction ORB path vs the stacked-gather path: on-device
   mismatch counts + A/B timing at the flagship budget (4 cam x 512 feat
   x 8 levels, 640x480);
3. the fused streaming-VI + device-LC program (new gravity gate +
   persistent loop edges) compiles and steps on TPU.

ONE packed fetch at the end (transport: d2h costs minutes; see
openmavis_tpu/utils/device.py).
"""

import json
import os
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

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from openmavis_tpu.frontend import extractor, orb, pyramid
    from openmavis_tpu.io import settings as cfg_mod
    from openmavis_tpu.utils import device as dev

    results = {}
    rng = np.random.RandomState(0)

    # ---- 1. reference yaml -> rig --------------------------------------
    ref_yaml = "/root/reference/Examples/Multi-Inertial/" \
        "HiltiChallenge2022.yaml"
    if os.path.exists(ref_yaml):
        cfg = cfg_mod.load_settings(ref_yaml)
        rig = cfg["rig"]
        log("settings", kind=int(rig.kind), n_cams=int(
            rig.params.shape[0]), w=cfg["camera_width"],
            freq=cfg["imu_frequency"])
        assert rig.params.shape[0] == 4 and cfg["camera_width"] == 720

    # ---- 2. patch-ORB vs stacked-gather: equivalence + timing ----------
    C, L, H, W = 4, 8, 480, 640
    K = 512
    stack = rng.uniform(0, 255, (C, L, H, W)).astype(np.float32)
    lv = rng.randint(0, L, (C, K)).astype(np.int32)
    xy = np.stack([rng.uniform(16, W - 17, (C, K)),
                   rng.uniform(16, H - 17, (C, K))],
                  axis=-1).astype(np.float32)
    xy = np.floor(xy)
    stack_d = jax.device_put(stack, tpu)
    lv_d = jax.device_put(lv, tpu)
    xy_d = jax.device_put(xy, tpu)

    def old_path(stack, lv, xy):
        blur = pyramid.blur(stack)
        ang = orb.keypoint_angles_stacked(stack, lv, xy)
        desc = orb.describe_stacked(blur, lv, xy, ang)
        return ang, desc

    def new_path(stack, lv, xy):
        blur = pyramid.blur(stack)
        patches, _, _ = orb.extract_patches(stack, lv, xy)
        ang = orb.patch_angles(patches)
        pb, ox, oy = orb.extract_patches(blur, lv, xy)
        desc = orb.patch_describe(pb, xy, ox, oy, ang)
        return ang, desc

    @jax.jit
    def compare(stack, lv, xy):
        with dev.host_trace():
            a_o, d_o = jax.vmap(old_path)(stack, lv, xy)
            a_n, d_n = jax.vmap(new_path)(stack, lv, xy)
            da = jnp.abs(a_n - a_o)
            da = jnp.minimum(da, 2 * np.pi - da)
            return jnp.max(da), jnp.mean((d_o != d_n).astype(jnp.float32))

    t0 = time.perf_counter()
    ang_err, bit_mismatch = compare(stack_d, lv_d, xy_d)
    bit_mismatch.block_until_ready()
    log("compare_compiled", s=round(time.perf_counter() - t0, 2))
    results["angle_err_x1e6"] = (ang_err * 1e6).astype(jnp.int32)
    results["bit_mismatch_x1e6"] = (bit_mismatch * 1e6).astype(jnp.int32)

    old_j = jax.jit(lambda s, l, x: jax.vmap(old_path)(s, l, x)[1])
    new_j = jax.jit(lambda s, l, x: jax.vmap(new_path)(s, l, x)[1])
    full_j = jax.jit(lambda imgs: extractor.extract_multicam(
        imgs, extractor.OrbConfig(n_features=512, n_levels=8)).desc)
    imgs_d = jax.device_put(stack[:, 0], tpu)

    for tag, fn, args in (("old_angdesc", old_j, (stack_d, lv_d, xy_d)),
                          ("new_angdesc", new_j, (stack_d, lv_d, xy_d)),
                          ("full_extract", full_j, (imgs_d,))):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        log(f"{tag}_compile", s=round(time.perf_counter() - t0, 2))
        # backpressure protocol: enqueue 40 heavy dispatches, block once
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(40)]
        outs[-1].block_until_ready()
        ms = (time.perf_counter() - t0) / 40 * 1e3
        log(f"{tag}_warm", ms=round(ms, 2))

    # ---- 3. fused streaming step + device LC on TPU --------------------
    from openmavis_tpu.geometry import cameras
    from openmavis_tpu.imu import preintegration as pre_mod
    from openmavis_tpu.io import synthetic
    from openmavis_tpu.optim.reprojection import RigParams
    from openmavis_tpu.pipeline import streaming_vi

    Ws, Hs, NF = 256, 192, 8
    pin = np.array([200.0, 200.0, Ws / 2, Hs / 2, 0, 0, 0, 0],
                   np.float32)
    R_cb = np.stack([np.eye(3, dtype=np.float32)] * 2)
    centers = np.array([[-0.1, 0, 0], [0.1, 0, 0]], np.float32)
    t_cb = -np.einsum("cij,cj->ci", R_cb, centers)
    rig2 = RigParams(kind=cameras.PINHOLE,
                     params=np.stack([pin] * 2), R_cb=R_cb, t_cb=t_cb)
    world = synthetic.BlobWorld.create(seed=3, n=1200)
    R_wb, t_wb = synthetic.orbit_trajectory(NF, radius=5.0, frac=0.1)
    frames = []
    for c in range(2):
        cb = -R_cb[c].T @ t_cb[c]
        frames.append(synthetic.render_sequence(
            world, cameras.PINHOLE, pin, R_wb @ R_cb[c].T,
            t_wb + np.einsum("tij,j->ti", R_wb, cb), Ws, Hs))
    frames = np.clip(np.stack(frames, 1), 0, 255).astype(np.uint8)
    dt = 0.05
    imu = synthetic.imu_from_trajectory(R_wb, t_wb, dt, rate_mult=10)
    scfg = streaming_vi.VIStreamConfig(
        img_w=Ws, img_h=Hs, n_cams=2, stereo_pairs=((0, 1),),
        orb=extractor.OrbConfig(n_features=128, n_levels=4),
        imu_freq=200.0, imu_per_frame=16, max_kf=16, max_mp=1024,
        traj_cap=32, ba_window=4, imu_init_kfs=4,
        kf_max_interval_s=0.1, temporal_refs=1, min_rig_landmarks=20)
    noise = pre_mod.ImuNoise.from_sigmas(1.7e-4, 2e-3, 1.9e-5, 3e-3,
                                         200.0)
    t0 = time.perf_counter()
    tr = streaming_vi.StreamingVITracker(
        rig2, scfg, noise, seed=0,
        device_lc=dict(score_min=30, temporal=2))
    imu_iter = iter(imu)
    pending = next(imu_iter, None)
    for i in range(NF):
        t = i * dt
        b = []
        while pending is not None and pending[2] <= t + 1e-9:
            b.append(pending)
            pending = next(imu_iter, None)
        tr.push(frames[i], t, b)
    tr.block()
    log("stream_lc_fused", s=round(time.perf_counter() - t0, 2))

    # ---- 4. single packed fetch ----------------------------------------
    t0 = time.perf_counter()
    snap = tr.snapshot()
    res_host = {k: int(np.asarray(v)) for k, v in dev.Packer().fetch(
        results).items()}
    log("fetch", s=round(time.perf_counter() - t0, 2),
        n_kf=int(snap["n_kf"]), frames_ok=int(snap["ok"].sum()),
        n_loops=int(snap.get("n_loops", 0)), **res_host)

    ok = (res_host["angle_err_x1e6"] < 2000      # < 2e-3 rad
          and res_host["bit_mismatch_x1e6"] < 5000   # < 0.5% bits
          and int(snap["n_kf"]) >= 2
          and int(snap["ok"].sum()) >= NF - 2)
    print("VERIFY OK" if ok else "VERIFY FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
