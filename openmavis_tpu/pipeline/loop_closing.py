"""Loop closing: place recognition -> Sim3 verification -> graph correction.

TPU-native rebuild of the reference's LoopClosing thread (reference:
src/LoopClosing.cc:98 Run; 401 NewDetectCommonRegions; 695
DetectCommonRegionsFromBoW — BoW candidates, Sim3Solver RANSAC, projection
verification; 1108 CorrectLoop — covisibility-propagated Sim3 correction +
essential-graph optimization). The detection math is jitted device kernels;
the accept/reject policy is host Python, synchronous after keyframe
insertion (the reference's thread becomes a pipeline stage).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import matcher
from ..geometry import lie
from ..optim import pose_graph
from ..slam_map import keyframe_db as kdb
from ..slam_map import map_state as ms
from ..slam_map import vocabulary as voc


@dataclass
class LoopConfig:
    candidate_source: str = "descriptor"  # "descriptor" | "spatial"
    min_desc_matches: int = 60    # direct-descriptor score floor
    spatial_radius: float = 1.0   # candidate gate (estimate units)
    recent_exclude: int = 8       # skip this many latest keyframes
    covis_exclude: int = 15       # shared-point threshold for exclusion
    min_sim3_inliers: int = 20
    covis_edge_threshold: int = 30
    loop_edge_weight: float = 5.0


@jax.jit
def _matched_pairs_body(m: ms.MapState, slot_a, slot_b):
    """Match features of two keyframes and return their associated
    landmark positions in each keyframe's BODY frame.

    (reference: loop detection matches via SearchByBoW then feeds matched
    MapPoint pairs to Sim3Solver, LoopClosing.cc:781-832)
    Returns (p_a [F,3], p_b [F,3], valid [F]).
    """
    F = m.kf_xy.shape[1]
    has_a = (m.kf_obs[slot_a] >= 0) & m.kf_feat_valid[slot_a]
    has_b = (m.kf_obs[slot_b] >= 0) & m.kf_feat_valid[slot_b]
    idx, hd = matcher.match_nn(m.kf_desc[slot_a], has_a,
                               m.kf_desc[slot_b], has_b,
                               max_dist=64, ratio=0.9,
                               mutual=True)
    idx = matcher.dedup_targets(idx, hd, F)
    okm = idx >= 0
    safe = jnp.where(okm, idx, 0)
    mp_a = jnp.where(okm, m.kf_obs[slot_a], 0)
    mp_b = jnp.where(okm, m.kf_obs[slot_b][safe], 0)
    valid = okm & m.mp_valid[mp_a] & m.mp_valid[mp_b]
    pa_w = m.mp_pos[mp_a]
    pb_w = m.mp_pos[mp_b]
    p_a = jnp.einsum("ji,fj->fi", m.kf_R[slot_a], pa_w - m.kf_t[slot_a])
    p_b = jnp.einsum("ji,fj->fi", m.kf_R[slot_b], pb_w - m.kf_t[slot_b])
    return p_a, p_b, valid


@jax.jit
def _correct_map(m: ms.MapState, s_new, R_new, t_new):
    """Apply optimized world->keyframe Sim3s back to the map.

    Keyframe poses absorb the scale; each landmark is corrected through its
    reference keyframe's old->new Sim3 (reference: CorrectLoop's
    CorrectedSim3 propagation + RunGlobalBundleAdjustment's spanning-tree
    point correction, LoopClosing.cc:2410-2470).
    """
    # old world->kf Sim3 per keyframe
    R_old_cw = jnp.swapaxes(m.kf_R, -1, -2)
    t_old_cw = -jnp.einsum("kij,kj->ki", R_old_cw, m.kf_t)
    s_old = jnp.ones(m.kf_R.shape[0], m.kf_t.dtype)

    # new keyframe poses: world-from-kf of (s, R, t): x_kf = s R x_w + t
    R_wk = jnp.swapaxes(R_new, -1, -2)
    t_wk = -jnp.einsum("kij,kj->ki", R_wk, t_new) / s_new[:, None]

    # landmark correction via reference KF r: p' = S_new_r^{-1}(S_old_r(p))
    r_kf = jnp.clip(m.mp_first_kf, 0, m.kf_R.shape[0] - 1)
    p_kf = (jnp.einsum("mij,mj->mi", R_old_cw[r_kf],
                       m.mp_pos - m.kf_t[r_kf]))
    si, Ri, ti = lie.sim3_inverse(s_new[r_kf], R_new[r_kf], t_new[r_kf])
    p_new = lie.sim3_apply(si, Ri, ti, p_kf)
    return m._replace(
        kf_R=lie.normalize_rotation(R_wk),
        kf_t=t_wk,
        mp_pos=jnp.where(m.mp_valid[:, None], p_new, m.mp_pos))


class LoopCloser:
    def __init__(self, vocab: voc.Vocabulary | None, max_kf: int,
                 cfg: LoopConfig = LoopConfig(), seed: int = 100):
        self.vocab = vocab            # optional BoW path
        self.cfg = cfg
        self.db = (kdb.allocate(max_kf, vocab.n_words)
                   if vocab is not None else None)
        self.key = jax.random.PRNGKey(seed)
        self.n_loops = 0

    def _next_key(self):
        self.key, sub = jax.random.split(self.key)
        return sub

    def on_keyframe(self, m: ms.MapState, slot: int):
        """Detect and (if verified) correct a loop. Returns (m, closed).

        Candidate retrieval uses direct dense descriptor scoring
        (tracking.descriptor_place_scores) — the MXU makes brute-force
        place recognition cheaper and far more discriminative than
        quantized BoW words; the vocabulary/KFDB path remains available
        for BoW-based retrieval at larger scales.
        """
        from ..solvers import sim3 as sim3_mod
        from . import tracking as trk

        cfg = self.cfg
        if self.vocab is not None:
            bow = voc.transform(self.vocab, m.kf_desc[slot],
                                m.kf_feat_valid[slot])
            self.db = kdb.add(self.db, slot, bow)
        cov = ms.covisibility_matrix(m)
        recent = jnp.arange(m.kf_valid.shape[0]) > slot - cfg.recent_exclude
        exclude = (cov[slot] >= cfg.covis_exclude) | recent | ~m.kf_valid

        if cfg.candidate_source == "spatial":
            # candidate = old keyframes near the current pose ESTIMATE
            # (map-reuse gating; appearance retrieval is the default, but
            # degenerates on texture-poor scenes)
            d = jnp.linalg.norm(m.kf_t - m.kf_t[slot], axis=-1)
            scores = jnp.where(exclude | (d > cfg.spatial_radius),
                               -jnp.inf, -d)
            top = jax.lax.top_k(scores, 3)[1]
            ok = jnp.isfinite(scores[top])
        else:
            scores = trk.descriptor_place_scores(m, jnp.asarray(slot))
            scores = jnp.where(exclude, -1, scores)
            top = jax.lax.top_k(scores, 3)[1]
            ok = scores[top] >= cfg.min_desc_matches

        cand_list = [int(c) for c, o in zip(np.asarray(top),
                                            np.asarray(ok)) if o]
        for cand in cand_list:
            p_a, p_b, valid = _matched_pairs_body(
                m, jnp.asarray(slot), jnp.asarray(cand))
            if int(valid.sum()) < cfg.min_sim3_inliers:
                continue
            res = sim3_mod.ransac_sim3(
                self._next_key(), p_a, p_b, valid,
                min_inliers=cfg.min_sim3_inliers)
            if not bool(res.success):
                continue
            m = self._correct(m, slot, cand, res, cov)
            self.n_loops += 1
            return m, True
        return m, False

    def _correct(self, m: ms.MapState, slot: int, cand: int, res, cov):
        """Essential-graph correction with the verified loop constraint."""
        cfg = self.cfg
        K = m.kf_R.shape[0]
        n_kf = int(m.n_kf)

        # nodes: current poses as world->kf Sim3 (scale 1)
        R_cw = jnp.swapaxes(m.kf_R, -1, -2)
        t_cw = -jnp.einsum("kij,kj->ki", R_cw, m.kf_t)
        s0 = jnp.ones((K,))

        edges = pose_graph.sequential_edges(s0, R_cw, t_cw,
                                            jnp.asarray(n_kf), K)
        # covisibility edges (reference: essential graph includes high-
        # covisibility edges, Optimizer.cc OptimizeEssentialGraph)
        cov_np = np.asarray(cov)
        ii, jj = np.nonzero(np.triu(cov_np, 2)
                            >= cfg.covis_edge_threshold)
        keep = (ii < n_kf) & (jj < n_kf)
        ii, jj = ii[keep][:128], jj[keep][:128]
        if len(ii) > 0:
            i_j = jnp.asarray(ii, jnp.int32)
            j_j = jnp.asarray(jj, jnp.int32)
            si_, Ri_, ti_ = lie.sim3_inverse(s0[i_j], R_cw[i_j],
                                             t_cw[i_j])
            se, Re, te = lie.sim3_compose(s0[j_j], R_cw[j_j], t_cw[j_j],
                                          si_, Ri_, ti_)
            cov_edges = pose_graph.PoseGraphEdges(
                i=i_j, j=j_j, s=se, R=Re, t=te,
                weight=jnp.ones((len(ii),)),
                valid=jnp.ones((len(ii),), bool))
            edges = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                                 edges, cov_edges)

        # loop edge: measured S_{slot<-cand} from the Sim3 solver result.
        # res maps body(slot) -> body(cand): p_cand = s R p_slot + t.
        # In world->kf terms: S_slot' = S_res^{-1} ... edge measures
        # S_ji with i=cand, j=slot: S_slot * S_cand^{-1} = S_res^{-1}
        si_r, Ri_r, ti_r = lie.sim3_inverse(res.s, res.R, res.t)
        loop_edge = pose_graph.PoseGraphEdges(
            i=jnp.asarray([cand], jnp.int32),
            j=jnp.asarray([slot], jnp.int32),
            s=si_r[None], R=Ri_r[None], t=ti_r[None],
            weight=jnp.asarray([cfg.loop_edge_weight]),
            valid=jnp.asarray([True]))
        edges = jax.tree.map(lambda a, b: jnp.concatenate([a, b]),
                             edges, loop_edge)

        fixed = jnp.zeros((K,), bool).at[cand].set(True)
        node_valid = m.kf_valid
        s_o, R_o, t_o, chi = pose_graph.optimize_pose_graph(
            s0, R_cw, t_cw, edges, fixed, node_valid)
        return _correct_map(m, s_o, R_o, t_o)
