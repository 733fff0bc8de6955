"""Per-stage timing of one tracked frame on the real device."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from openmavis_tpu.frontend import extractor
from openmavis_tpu.geometry import cameras
from openmavis_tpu.io import synthetic
from openmavis_tpu.optim.reprojection import RigParams
from openmavis_tpu.pipeline import tracking

W, H = 512, 384
PIN = np.array([380.0, 380.0, W / 2, H / 2, 0, 0, 0, 0], np.float32)
rig = RigParams(kind=cameras.PINHOLE, params=jnp.asarray(PIN)[None],
                R_cb=jnp.eye(3)[None], t_cb=jnp.zeros((1, 3)))

world = synthetic.BlobWorld.create(seed=3, n=3000)
n_frames = 12
R_wc, t_wc = synthetic.orbit_trajectory(n_frames, radius=6.0, frac=0.25)
frames = synthetic.render_sequence(world, cameras.PINHOLE, PIN, R_wc, t_wc,
                                   W, H)
frames_dev = [jnp.asarray(f) for f in frames]

cfg = tracking.TrackerConfig(
    img_w=W, img_h=H, orb=extractor.OrbConfig(n_features=512, n_levels=4),
    max_kf=32, max_mp=4096)
tr = tracking.Tracker(rig, cfg, seed=0)
for i, img in enumerate(frames_dev):
    tr.process_frame(img, i / 20.0)
jax.block_until_ready(tr.map.mp_pos)

print(f"state={tr.state} n_kf={tr.n_kf}")

def bench(name, fn, n=20):
    fn()  # warm
    jax.block_until_ready(tr.map.mp_pos)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn()
    jax.block_until_ready(r if r is not None else tr.map.mp_pos)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:32s} {dt:8.2f} ms")
    return dt

img = frames_dev[-1]
feats = tr._ext(img)
jax.block_until_ready(feats.xy)

bench("extract (jit call)", lambda: tr._ext(img))
out = tracking.track_step(tr.map, feats, tr.R, tr.t, rig.kind, rig,
                          float(W), float(H), 15.0)
bench("track_step", lambda: tracking.track_step(
    tr.map, feats, tr.R, tr.t, rig.kind, rig, float(W), float(H), 15.0))
bench("extract+track (2 dispatch)", lambda: tracking.track_step(
    tr.map, tr._ext(img), tr.R, tr.t, rig.kind, rig,
    float(W), float(H), 15.0))
bench("int(n_in) host fetch", lambda: int(out[3]))

def rec():
    ref = max(tr.last_kf_slot, 0)
    R_ref = np.asarray(tr.map.kf_R[ref])
    t_ref = np.asarray(tr.map.kf_t[ref])
    R_ref.T @ np.asarray(tr.R)
    R_ref.T @ (np.asarray(tr.t) - t_ref)
bench("_record transfers", rec)

def full():
    tr.trajectory = tr.trajectory[:5]
    tr.process_frame(img, 99.0)
bench("process_frame total", full, n=10)

# KF insert cost
t0 = time.perf_counter()
fm = jnp.full((512,), -1, jnp.int32)
tr._insert_keyframe(feats, 100.0, fm, 200)
jax.block_until_ready(tr.map.mp_pos)
print(f"{'_insert_keyframe (cold-ish)':32s} {(time.perf_counter()-t0)*1e3:8.2f} ms")
