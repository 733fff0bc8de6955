"""Multi-camera visual-inertial tracking — the flagship MAVIS pipeline.

TPU-native rebuild of the reference's IMU_MULTI mode (reference:
System::TrackMulti src/System.cc:311; Tracking::GrabImageMulti
src/Tracking.cc:1410; the multi Frame ctor src/Frame.cc:1767-1949 with
4-camera feature banding; Tracking::MultiInitialization src/Tracking.cc:2339;
PreintegrateIMU src/Tracking.cc:1625; PredictStateIMU src/Tracking.cc:1723;
LocalMapping's staged IMU init src/LocalMapping.cc:1255).

Structure: per-frame features from all C cameras are one contiguous bank of
C*F slots (band c occupies [c*F, (c+1)*F)) — the reference's
Nleft/Nright/Nsideleft/Nsideright banding as an array layout. All per-camera
work is a static Python loop over C inside one jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import extractor, matcher
from ..geometry import cameras, lie, triangulation
from ..imu import preintegration as pre_mod
from ..optim import ba, inertial_init, pose_opt
from ..optim.reprojection import RigParams
from ..slam_map import map_state as ms
from . import tracking as mono


def concat_bands(feats: extractor.Features) -> dict:
    """[C, F, ...] camera-batched features -> single bank [C*F, ...]."""
    C, F = feats.valid.shape
    cam = jnp.repeat(jnp.arange(C, dtype=jnp.int32), F)
    return dict(
        xy=feats.xy.reshape(C * F, 2),
        desc=feats.desc.reshape(C * F, 256),
        level=feats.level.reshape(C * F),
        sigma2=feats.sigma2.reshape(C * F),
        cam=cam,
        valid=feats.valid.reshape(C * F),
    )


@partial(jax.jit, static_argnames=("rig_kind", "n_cams", "orb_cfg"))
def frame_step_multi(m: ms.MapState, images, R_pred, t_pred,
                     rig_kind: int, n_cams: int, rig: RigParams, orb_cfg,
                     img_w: float, img_h: float, radius, min_last_kf=-1,
                     dist=None):
    """Fused per-frame step: multi-camera extraction + banding + tracking
    in one device program (one dispatch per frame)."""
    feats = extractor.extract_multicam(images, orb_cfg)
    if dist is not None:
        feats = extractor.undistort_features(feats, rig.params, dist)
    bank = concat_bands(feats)
    out = track_step_multi(m, bank, R_pred, t_pred, rig_kind, n_cams,
                           rig, img_w, img_h, radius, min_last_kf)
    return out + (bank,)


@partial(jax.jit, static_argnames=("rig_kind", "n_cams"))
def track_step_multi(m: ms.MapState, bank, R_pred, t_pred,
                     rig_kind: int, n_cams: int, rig: RigParams,
                     img_w: float, img_h: float, radius,
                     min_last_kf=-1):
    """Whole-map projection tracking across all camera bands + pose opt.

    Returns (R, t, feat_mp [C*F], n_in, vis [M], keep_per_band).
    """
    CF = bank["xy"].shape[0]
    F = CF // n_cams
    M = m.mp_pos.shape[0]

    all_idx = []
    all_dist = []
    for c in range(n_cams):
        uv_proj, lvl, vis_c, dist = mono.project_landmarks(
            m, R_pred, t_pred, rig_kind, rig.params[c], rig.R_cb[c],
            rig.t_cb[c], img_w, img_h)
        vis_c = vis_c & (m.mp_last_kf >= min_last_kf)
        sl = slice(c * F, (c + 1) * F)
        idx_c, dist_c = matcher.match_projection(
            uv_proj, lvl, radius, m.mp_desc, vis_c,
            bank["xy"][sl], bank["level"][sl], bank["desc"][sl],
            bank["valid"][sl], max_dist=matcher.TH_HIGH, ratio=0.9)
        idx_c = matcher.dedup_targets(idx_c, dist_c, F)
        # to bank-global feature ids
        all_idx.append(jnp.where(idx_c >= 0, idx_c + c * F, -1))
        all_dist.append(dist_c)

    # landmark may match in several cameras; keep the best one
    idx_sc = jnp.stack(all_idx, axis=1)       # [M, C]
    dist_sc = jnp.stack(all_dist, axis=1)
    best_c = jnp.argmin(jnp.where(idx_sc >= 0, dist_sc, 1 << 20), axis=1)
    idx = jnp.take_along_axis(idx_sc, best_c[:, None], axis=1)[:, 0]
    matched = idx >= 0
    safe_idx = jnp.where(matched, idx, 0)

    uv_obs = bank["xy"][safe_idx]
    sigma2 = bank["sigma2"][safe_idx]
    cam_idx = bank["cam"][safe_idx]
    R, t, inlier, n_in = pose_opt.pose_optimization(
        R_pred, t_pred, m.mp_pos, cam_idx, uv_obs, sigma2,
        matched & m.mp_valid, rig)

    keep = matched & inlier
    feat_mp = jnp.full((CF,), -1, jnp.int32)
    feat_mp = feat_mp.at[jnp.where(keep, idx, CF - 1)].max(
        jnp.where(keep, jnp.arange(M, dtype=jnp.int32), -1))
    vis = matched  # proxy for statistics
    return R, t, feat_mp, n_in, vis, keep


@partial(jax.jit, static_argnames=("rig_kind", "pair", "n_cams"))
def stereo_spawn(m: ms.MapState, slot, rig_kind: int, n_cams: int,
                 rig: RigParams, pair: tuple, cap_new: int = 512,
                 max_depth: float = 40.0):
    """Triangulate landmarks from one intra-rig camera pair of keyframe
    `slot` (reference: Frame::ComputeMultiFishEyeMatches + KannalaBrandt8::
    TriangulateMatches, src/Frame.cc:1461-1527; the metric-scale source of
    the multi-camera pipeline).
    """
    c1, c2 = pair
    CF = m.kf_xy.shape[1]
    F = CF // n_cams
    s1 = slice(c1 * F, (c1 + 1) * F)
    s2 = slice(c2 * F, (c2 + 1) * F)

    d1 = m.kf_desc[slot][s1]
    d2 = m.kf_desc[slot][s2]
    un1 = ((m.kf_obs[slot] < 0) & m.kf_feat_valid[slot])[s1]
    un2 = ((m.kf_obs[slot] < 0) & m.kf_feat_valid[slot])[s2]
    idx, hdist = matcher.match_nn(d1, un1, d2, un2, max_dist=64,
                                  ratio=0.85, mutual=True)
    idx = matcher.dedup_targets(idx, hdist, F)
    matched = idx >= 0
    safe = jnp.where(matched, idx, 0)

    # relative pose cam1 <- cam2 from rig extrinsics:
    # p_c1 = R_cb1 R_cb2^T (p_c2 - t_... ) : T_c1c2 = T_c1b * T_bc2
    R_c1b, t_c1b = rig.R_cb[c1], rig.t_cb[c1]
    R_c2b, t_c2b = rig.R_cb[c2], rig.t_cb[c2]
    R12 = R_c1b @ R_c2b.T
    t12 = t_c1b - R12 @ t_c2b

    uv1 = m.kf_xy[slot][s1]
    uv2 = m.kf_xy[slot][s2][safe]
    p1 = jnp.broadcast_to(rig.params[c1], (F, 8))
    p2 = jnp.broadcast_to(rig.params[c2], (F, 8))
    X_c1, depth, tri_ok = triangulation.triangulate_matches(
        rig_kind, p1, p2, jnp.broadcast_to(R12, (F, 3, 3)),
        jnp.broadcast_to(t12, (F, 3)), uv1, uv2,
        sigma_level1=m.kf_sigma2[slot][s1],
        sigma_level2=m.kf_sigma2[slot][s2][safe],
        min_cos_parallax=1.0)   # rig baseline is known-good; skip gate
    good = matched & tri_ok & (depth > 0.05) & (depth < max_depth)

    # cam1 -> world: T_wb * T_bc1
    R_wb, t_wb = m.kf_R[slot], m.kf_t[slot]
    R_wc1 = R_wb @ R_c1b.T
    t_wc1 = t_wb + R_wb @ (-R_c1b.T @ t_c1b)
    X_w = jnp.einsum("ij,fj->fi", R_wc1, X_c1) + t_wc1

    order = jnp.cumsum(good.astype(jnp.int32)) - 1
    M = m.mp_pos.shape[0]
    slot_mp = m.n_mp + order
    write = good & (order < cap_new) & (slot_mp < M)
    tgt = jnp.where(write, slot_mp, M)

    mp_pos = jnp.zeros((M + 1, 3), m.mp_pos.dtype).at[tgt].set(X_w)[:M]
    mp_desc = jnp.zeros((M + 1, 256), jnp.int8).at[tgt].set(d1)[:M]
    newly = jnp.zeros((M + 1,), bool).at[tgt].set(write)[:M]

    # wire observations in both bands
    obs = m.kf_obs[slot]
    obs = obs.at[c1 * F + jnp.arange(F)].set(
        jnp.where(write, slot_mp, obs[s1]))
    obs = obs.at[c2 * F + safe].max(jnp.where(write, slot_mp, -1))
    return m._replace(
        mp_pos=jnp.where(newly[:, None], mp_pos, m.mp_pos),
        mp_desc=jnp.where(newly[:, None], mp_desc, m.mp_desc),
        mp_valid=m.mp_valid | newly,
        mp_first_kf=jnp.where(newly, slot, m.mp_first_kf),
        mp_last_kf=jnp.where(newly, slot, m.mp_last_kf),
        n_mp=m.n_mp + jnp.sum(write.astype(jnp.int32)),
        kf_obs=m.kf_obs.at[slot].set(obs),
    ), jnp.sum(write.astype(jnp.int32))


@dataclass
class MultiTrackerConfig:
    img_w: int = 640
    img_h: int = 480
    n_cams: int = 4
    stereo_pairs: tuple = ((0, 1),)    # overlapping rig pairs
    orb: extractor.OrbConfig = field(default_factory=extractor.OrbConfig)
    max_kf: int = 64
    max_mp: int = 16384
    match_radius: float = 15.0
    relost_radius: float = 30.0
    min_inliers_track: int = 30
    local_map_window: Optional[int] = None
    fused_frontend: bool = False
    kf_min_inlier_frac: float = 0.75
    kf_min_inliers_abs: int = 120
    kf_max_interval_s: float = 0.5     # inertial KF cadence (Tracking.cc:3003)
    new_mp_cap: int = 384
    ba_window: int = 8
    imu_freq: float = 200.0
    imu_buf: int = 256                 # max samples between keyframes
    imu_init_kfs: int = 8              # KFs before IMU initialization
    use_imu: bool = True
    # frames to coast in LOST before abandoning the map and spawning a
    # fresh one in the Atlas (reference: CreateMapInAtlas,
    # src/Tracking.cc:1953-1968)
    max_lost_frames: int = 20


class MultiTracker:
    """Multi-camera (optionally inertial) tracker."""

    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2

    def __init__(self, rig: RigParams, cfg: MultiTrackerConfig,
                 noise: pre_mod.ImuNoise | None = None, seed: int = 0,
                 loop_closer=None, atlas=None, dist=None):
        self.rig = rig
        self.cfg = cfg
        # optional [C, 4] radtan distortion of a distorted-pinhole rig
        # (reference: Frame::UndistortKeyPoints)
        self.dist = None if dist is None else jnp.asarray(dist)
        self.noise = noise or pre_mod.ImuNoise.from_sigmas(
            1.7e-4, 2e-3, 1.9e-5, 3e-3, cfg.imu_freq)
        self.loop_closer = loop_closer
        self.atlas = atlas
        self.state = self.NOT_INITIALIZED
        CF = cfg.n_cams * cfg.orb.n_features
        if atlas is not None:
            if not atlas.maps:
                atlas.create_map(cfg.max_kf, CF, cfg.max_mp)
            self.map = atlas.current_map
            self.map_id = atlas.current
        else:
            self.map = ms.allocate(cfg.max_kf, CF, cfg.max_mp)
            self.map_id = 0
        self.lost_frames = 0
        # localization-only: track, never extend the map
        # (reference: ActivateLocalizationMode, System.h:132)
        self.localization_only = False
        # preintegration chains of parked maps, keyed by atlas map index
        self._parked_pre = {}
        self.key = jax.random.PRNGKey(seed)
        self.R = jnp.eye(3)
        self.t = jnp.zeros(3)
        self.v = jnp.zeros(3)
        self.bias = jnp.zeros(6)
        self.vel_R = jnp.eye(3)
        self.vel_t = jnp.zeros(3)
        self.imu_initialized = False
        self.last_kf_slot = -1
        self.last_kf_time = None
        self.last_time = None
        self.ref_kf_inliers = 0
        self.n_kf = 0
        self.trajectory = []
        # IMU queues (host): samples since last frame and since last KF
        self._imu_frame = []
        self._imu_kf = []
        # per-KF preintegrations (list of Preintegrated, index = KF slot)
        self.kf_pre = []
        def _ext(im, dist=self.dist, rig_p=rig.params):
            feats = extractor.extract_multicam(im, cfg.orb)
            if dist is not None:
                feats = extractor.undistort_features(feats, rig_p, dist)
            return feats
        self._ext = jax.jit(_ext)

    # -- IMU ---------------------------------------------------------------
    def feed_imu(self, w, a, t):
        """Queue one IMU sample (gyro rad/s, accel m/s^2, timestamp)."""
        self._imu_frame.append((np.asarray(w, np.float32),
                                np.asarray(a, np.float32), float(t)))
        self._imu_kf.append(self._imu_frame[-1])

    def _integrate(self, queue, t_end, t_start):
        n = self.cfg.imu_buf
        ws = np.zeros((n, 3), np.float32)
        accs = np.zeros((n, 3), np.float32)
        dts = np.zeros((n,), np.float32)
        prev_t = t_start
        j = 0
        for (w, a, t) in queue:
            if t <= t_start or j >= n:
                continue
            dt = min(t, t_end) - prev_t
            if dt <= 0:
                continue
            ws[j], accs[j], dts[j] = w, a, dt
            prev_t = min(t, t_end)
            j += 1
        if j < n and prev_t < t_end and j > 0:
            ws[j], accs[j] = ws[j - 1], accs[j - 1]
            dts[j] = t_end - prev_t
        return pre_mod.integrate(jnp.asarray(ws), jnp.asarray(accs),
                                 jnp.asarray(dts), self.bias, self.noise)

    # -- main --------------------------------------------------------------
    def process_frame(self, images: jnp.ndarray, time: float):
        """images: [C, H, W] float32."""
        cfg = self.cfg

        if self.state == self.NOT_INITIALIZED:
            bank = concat_bands(self._ext(images))
            ok = self._initialize(bank, time)
            self._record(time)
            self.last_time = time
            self._imu_frame = []
            return ok

        # pose prediction: IMU if available+initialized, else const velocity
        if cfg.use_imu and self.imu_initialized and self._imu_frame:
            pre = self._integrate(self._imu_frame, time, self.last_time)
            R_pred, t_pred, v_pred = pre_mod.predict_state(
                self.R, self.t, self.v, pre, self.bias)
        else:
            R_pred = self.R @ self.vel_R
            t_pred = self.t + self.R @ self.vel_t
            v_pred = self.v
        self._imu_frame = []

        min_last = (-1 if cfg.local_map_window is None
                    else self.last_kf_slot - cfg.local_map_window)
        if cfg.fused_frontend:
            R, t, feat_mp, n_in, vis, keep, bank = frame_step_multi(
                self.map, images, R_pred, t_pred, self.rig.kind,
                cfg.n_cams, self.rig, cfg.orb, float(cfg.img_w),
                float(cfg.img_h), cfg.match_radius, min_last, self.dist)
        else:
            bank = concat_bands(self._ext(images))
            R, t, feat_mp, n_in, vis, keep = track_step_multi(
                self.map, bank, R_pred, t_pred, self.rig.kind,
                cfg.n_cams, self.rig, float(cfg.img_w),
                float(cfg.img_h), cfg.match_radius, min_last)
        n_in = int(n_in)
        if n_in < cfg.min_inliers_track:
            R, t, feat_mp, n_in, vis, keep = track_step_multi(
                self.map, bank, self.R, self.t, self.rig.kind, cfg.n_cams,
                self.rig, float(cfg.img_w), float(cfg.img_h),
                cfg.relost_radius)
            n_in = int(n_in)
            if n_in < cfg.min_inliers_track:
                self.state = self.LOST
                self.lost_frames += 1
                if (self.atlas is not None
                        and self.lost_frames > cfg.max_lost_frames
                        and self.n_kf >= 2):
                    # park the map and start fresh (reference:
                    # CreateMapInAtlas, src/Tracking.cc:1953-1968)
                    self._spawn_new_map()
                self._record(time)
                self.last_time = time
                return False

        dt = max(time - (self.last_time if self.last_time is not None
                         else time - 1e-3), 1e-3)
        self.vel_R = self.R.T @ R
        self.vel_t = self.R.T @ (t - self.t)
        self.v = (t - self.t) / dt if not self.imu_initialized else \
            (t - self.t) / dt
        self.R, self.t = R, t
        self.state = self.OK
        self.lost_frames = 0

        need_kf = (n_in < cfg.kf_min_inlier_frac
                   * max(self.ref_kf_inliers, 1)
                   or n_in < cfg.kf_min_inliers_abs
                   or (cfg.use_imu and self.last_kf_time is not None
                       and time - self.last_kf_time > cfg.kf_max_interval_s))
        if (need_kf and self.n_kf < cfg.max_kf
                and not self.localization_only):
            self._insert_keyframe(bank, time, feat_mp, n_in)

        self._record(time)
        self.last_time = time
        return True

    def _record(self, time):
        # store frame pose RELATIVE to the latest keyframe so later map
        # corrections (IMU-init rotation, loop closure, GBA) retroactively
        # fix the whole trajectory (reference: Tracking keeps
        # mlRelativeFramePoses and System::SaveTrajectoryEuRoC replays them
        # against final KF poses, src/System.cc:717-1090)
        ref = max(self.last_kf_slot, 0)
        R_ref = np.asarray(self.map.kf_R[ref])
        t_ref = np.asarray(self.map.kf_t[ref])
        R_rel = R_ref.T @ np.asarray(self.R)
        t_rel = R_ref.T @ (np.asarray(self.t) - t_ref)
        self.trajectory.append((time, self.map_id, ref, R_rel, t_rel))

    def get_trajectory(self):
        """Reconstruct (times, R [T,3,3], t [T,3]) vs the FINAL map(s)."""
        maps = self.atlas.maps if self.atlas is not None else [self.map]
        if self.atlas is not None:
            self._sync_atlas()
        kf_R = [np.asarray(m.kf_R) for m in maps]
        kf_t = [np.asarray(m.kf_t) for m in maps]
        times, Rs, ts = [], [], []
        for (tm, mid, ref, R_rel, t_rel) in self.trajectory:
            R = kf_R[mid][ref] @ R_rel
            t = kf_t[mid][ref] + kf_R[mid][ref] @ t_rel
            times.append(tm)
            Rs.append(R)
            ts.append(t)
        return np.asarray(times), np.stack(Rs), np.stack(ts)

    # -- Atlas bookkeeping ---------------------------------------------------
    def _sync_atlas(self):
        if self.atlas is not None:
            self.atlas.maps[self.map_id] = self.map

    def _spawn_new_map(self):
        """Park the current map + its preintegration chain; start fresh.
        IMU re-initializes in the new map (the reference resets its
        IMU-init flags in CreateMapInAtlas); the current bias estimate is
        kept as the starting guess."""
        cfg = self.cfg
        self._sync_atlas()
        self._parked_pre[self.map_id] = self.kf_pre
        CF = cfg.n_cams * cfg.orb.n_features
        self.map_id = self.atlas.create_map(cfg.max_kf, CF, cfg.max_mp)
        self.map = self.atlas.current_map
        self.state = self.NOT_INITIALIZED
        self.R = jnp.eye(3)
        self.t = jnp.zeros(3)
        self.v = jnp.zeros(3)
        self.vel_R = jnp.eye(3)
        self.vel_t = jnp.zeros(3)
        self.imu_initialized = False
        self.last_kf_slot = -1
        self.last_kf_time = None
        self.n_kf = 0
        self.ref_kf_inliers = 0
        self.lost_frames = 0
        self.kf_pre = []
        self._imu_kf = []

    def _remap_after_merge(self, old_map_id, new_map_id, kf_off):
        fixed = []
        for (tm, mid, ref, R_rel, t_rel) in self.trajectory:
            if mid == old_map_id:
                fixed.append((tm, new_map_id, ref + kf_off, R_rel, t_rel))
            else:
                mid2 = mid - 1 if mid > old_map_id else mid
                fixed.append((tm, mid2, ref, R_rel, t_rel))
        self.trajectory = fixed
        # weld preintegration chains: the parked (older) map's chain fills
        # slots [0, kf_off); this map's chain follows (reference:
        # MergeLocal2 keeps both temporal chains, src/LoopClosing.cc:1956)
        parked = dict(self._parked_pre)
        self._parked_pre = {}
        for mid, pres in parked.items():
            mid2 = mid - 1 if mid > old_map_id else mid
            if mid2 == new_map_id:
                chain = list(pres) + [None] * (kf_off - len(pres))
                self.kf_pre = chain[:kf_off] + self.kf_pre
            elif mid != old_map_id:
                self._parked_pre[mid2] = pres

    def _initialize(self, bank, time):
        """Multi-camera init: stereo-triangulate the first frame directly
        (reference: MultiInitialization, Tracking.cc:2339 — metric scale
        from the rig baseline, no two-view RANSAC needed)."""
        cfg = self.cfg
        z3 = jnp.zeros(3)
        CF = bank["xy"].shape[0]
        m = ms.insert_keyframe(
            self.map, 0, jnp.eye(3), z3, z3, z3, z3, time,
            bank["xy"], bank["desc"], bank["level"], bank["sigma2"],
            bank["cam"], bank["valid"],
            jnp.full((CF,), -1, jnp.int32))
        total = 0
        for pair in cfg.stereo_pairs:
            m, n_new = stereo_spawn(m, jnp.asarray(0), self.rig.kind,
                                    cfg.n_cams, self.rig, pair)
            total += int(n_new)
        if total < 50:
            self.map = ms.allocate(cfg.max_kf, CF, cfg.max_mp)
            return False
        self.map = ms.update_mp_geometry(m, None)
        self.last_kf_slot = 0
        self.last_kf_time = time
        self.n_kf = 1
        self.ref_kf_inliers = total
        self.kf_pre = [None]
        self._imu_kf = []
        self.state = self.OK
        return True

    def _insert_keyframe(self, bank, time, feat_mp, n_in):
        cfg = self.cfg
        slot = self.n_kf
        z3 = jnp.zeros(3)
        self.map = ms.insert_keyframe(
            self.map, slot, self.R, self.t, self.v, self.bias[:3],
            self.bias[3:], time, bank["xy"], bank["desc"], bank["level"],
            bank["sigma2"], bank["cam"], bank["valid"], feat_mp)
        # intra-rig stereo points (metric) + temporal points per camera
        for pair in cfg.stereo_pairs:
            self.map, _ = stereo_spawn(
                self.map, jnp.asarray(slot), self.rig.kind, cfg.n_cams,
                self.rig, pair, cap_new=cfg.new_mp_cap)
        self.map = mono.fuse_new_landmarks(self.map, jnp.asarray(slot),
                                           cap=cfg.new_mp_cap)
        self.map = ms.update_mp_geometry(self.map, None)

        # preintegration for this KF interval
        if cfg.use_imu and self._imu_kf and self.last_kf_time is not None:
            pre = self._integrate(self._imu_kf, time, self.last_kf_time)
            self.kf_pre.append(pre)
        else:
            self.kf_pre.append(None)
        self._imu_kf = []

        # window BA (visual for now; VI once IMU is initialized)
        if self.imu_initialized:
            self._vi_local_ba(slot)
        else:
            self.map, _ = mono.local_ba_step(
                self.map, jnp.asarray(slot), self.rig.kind, self.rig,
                window=cfg.ba_window)

        self.last_kf_slot = slot
        self.last_kf_time = time
        self.n_kf += 1
        self.ref_kf_inliers = max(n_in, 1)

        if (cfg.use_imu and not self.imu_initialized
                and self.n_kf >= cfg.imu_init_kfs):
            self._initialize_imu()

        if self.loop_closer is not None:
            self.map, closed = self.loop_closer.on_keyframe(self.map, slot)
            # cross-map merge detection (reference: merge path of
            # LoopClosing -> MergeLocal2 for inertial maps)
            if self.atlas is not None and len(self.atlas.maps) > 1:
                self._sync_atlas()
                old_id = self.map_id
                hit = self.loop_closer.detect_merge(self.atlas, slot)
                if hit is not None:
                    new_id, kf_off, _ = hit
                    self.map = self.atlas.current_map
                    self._remap_after_merge(old_id, new_id, kf_off)
                    self.map_id = new_id
                    slot = slot + kf_off
                    self.last_kf_slot = slot
                    self.n_kf = int(self.map.n_kf)
                    # welding BA over the junction
                    if self.imu_initialized:
                        self._vi_local_ba(slot)
                    else:
                        self.map, _ = mono.local_ba_step(
                            self.map, jnp.asarray(slot), self.rig.kind,
                            self.rig, window=cfg.ba_window)
                    self._sync_atlas()

        self.R = self.map.kf_R[slot]
        self.t = self.map.kf_t[slot]
        self.v = self.map.kf_v[slot]

    def _initialize_imu(self):
        """Staged IMU init (reference: LocalMapping::InitializeIMU)."""
        cfg = self.cfg
        K = self.n_kf
        pres = [p for p in self.kf_pre[1:K] if p is not None]
        if len(pres) < K - 1 or K < 3:
            return
        pre_b = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
        m = self.map
        res = inertial_init.inertial_optimization(
            m.kf_R[:K], m.kf_t[:K], m.kf_v[:K], pre_b,
            jnp.ones((K - 1,), bool), fix_scale=True)  # metric rig scale
        if not bool(jnp.isfinite(res.chi2)):
            return
        # gravity-align the map: world' = R_gw world
        R_gw = res.R_wg.T
        Rn, pn, vn, ptn = inertial_init.apply_scaled_rotation(
            m.kf_R, m.kf_t,
            m.kf_v.at[:K].set(res.v), m.mp_pos, R_gw, jnp.asarray(1.0))
        self.map = m._replace(
            kf_R=Rn, kf_t=pn, kf_v=vn, mp_pos=ptn,
            kf_bg=jnp.tile(res.bg, (m.kf_bg.shape[0], 1)),
            kf_ba=jnp.tile(res.ba, (m.kf_ba.shape[0], 1)))
        self.bias = jnp.concatenate([res.bg, res.ba])
        self.R = self.map.kf_R[self.last_kf_slot]
        self.t = self.map.kf_t[self.last_kf_slot]
        self.v = self.map.kf_v[self.last_kf_slot]
        self.imu_initialized = True

    def _vi_local_ba(self, newest):
        """VI window BA using the stored preintegration chain."""
        cfg = self.cfg
        W = cfg.ba_window
        lo = max(newest - W + 1, 0)
        w_ids = list(range(lo, newest + 1))
        if len(w_ids) < 2:
            return
        pres = []
        ok = True
        for k in w_ids[1:]:
            if k >= len(self.kf_pre) or self.kf_pre[k] is None:
                ok = False
                break
            pres.append(self.kf_pre[k])
        if not ok:
            self.map, _ = mono.local_ba_step(
                self.map, jnp.asarray(newest), self.rig.kind, self.rig,
                window=W)
            return
        m = self.map
        ids = jnp.asarray(w_ids)
        pre_b = jax.tree.map(lambda *xs: jnp.stack(xs), *pres)
        edges = ba.InertialEdges(pre=pre_b,
                                 valid=jnp.ones((len(pres),), bool))

        K, CF = m.kf_obs.shape
        Wn = len(w_ids)
        kf_local = jnp.repeat(jnp.arange(Wn), CF)
        slots = ids[kf_local]
        featix = jnp.tile(jnp.arange(CF), Wn)
        mp = m.kf_obs[slots, featix]
        valid = (mp >= 0) & m.kf_feat_valid[slots, featix]
        mp_safe = jnp.where(valid, mp, 0)
        valid = valid & m.mp_valid[mp_safe]
        obs = ba.BAObservations(
            kf=kf_local, mp=mp_safe, cam=m.kf_cam[slots, featix],
            uv=m.kf_xy[slots, featix], sigma2=m.kf_sigma2[slots, featix],
            valid=valid)
        state0 = ba.BAState(
            R=m.kf_R[ids], t=m.kf_t[ids], v=m.kf_v[ids],
            bg=m.kf_bg[ids], ba=m.kf_ba[ids], points=m.mp_pos)
        fixed = jnp.arange(Wn) < 1
        M = m.mp_pos.shape[0]
        observed = jnp.zeros((M,), bool).at[mp_safe].max(valid)
        state, inlier, chi = ba.bundle_adjust(
            state0, obs, self.rig, fixed, point_fixed=~observed,
            edges=edges, stages=(4, 6))
        self.map = m._replace(
            kf_R=m.kf_R.at[ids].set(state.R),
            kf_t=m.kf_t.at[ids].set(state.t),
            kf_v=m.kf_v.at[ids].set(state.v),
            kf_bg=m.kf_bg.at[ids].set(state.bg),
            kf_ba=m.kf_ba.at[ids].set(state.ba),
            mp_pos=jnp.where(observed[:, None], state.points, m.mp_pos),
            kf_obs=m.kf_obs.at[slots, featix].set(
                jnp.where(valid & ~inlier, -1, m.kf_obs[slots, featix])),
        )
        self.bias = jnp.concatenate([state.bg[-1], state.ba[-1]])
