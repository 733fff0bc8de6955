"""Loop-closing verification chain: a perceptually-aliased candidate that
passes the pair-wise Sim3 must be REJECTED by the temporal-consistency +
covisible-group gates; a true loop must still close.

(reference: src/LoopClosing.cc:944-994 group projection verification,
440-520/1019 temporal re-confirmation — the guards that make a wrong
`_correct_map`, which is unrecoverable, unlikely.)
"""

import numpy as np
import jax
import jax.numpy as jnp

from openmavis_tpu.geometry import cameras, lie
from openmavis_tpu.optim.reprojection import RigParams
from openmavis_tpu.pipeline import loop_closing
from openmavis_tpu.slam_map import map_state as ms

# heavyweight (compile-dominated) — excluded from the fast tier
pytestmark = __import__('pytest').mark.slow

W, H = 512, 384
PIN = np.array([380.0, 380.0, W / 2, H / 2, 0, 0, 0, 0], np.float32)
K, F, M = 16, 96, 512
N_L = 60


def mono_rig():
    return RigParams(kind=cameras.PINHOLE,
                     params=jnp.asarray(PIN)[None],
                     R_cb=jnp.eye(3)[None], t_cb=jnp.zeros((1, 3)))


def _observe(m, slot, R_wb, t_wb, mp_ids, desc):
    """Insert keyframe `slot` at (R_wb, t_wb) observing landmarks mp_ids
    (projected) with the given descriptors."""
    pts = m.mp_pos[jnp.asarray(mp_ids)]
    p_b = jnp.einsum("ji,mj->mi", R_wb, pts - t_wb)
    uv = cameras.project(cameras.PINHOLE, jnp.asarray(PIN), p_b)
    n = len(mp_ids)
    xy = jnp.zeros((F, 2)).at[:n].set(uv)
    obs = jnp.full((F,), -1, jnp.int32).at[:n].set(jnp.asarray(mp_ids))
    fv = jnp.arange(F) < n
    d = jnp.zeros((F, 256), jnp.int8).at[:n].set(desc)
    return ms.insert_keyframe(
        m, slot, R_wb, t_wb, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        float(slot), xy, d, jnp.zeros((F,), jnp.int32), jnp.ones((F,)),
        jnp.zeros((F,), jnp.int32), fv, obs)


def build_aliased_map(second_consistent: bool, R_B=None):
    """Map with scene A (KFs 0-2) and a far-away aliased scene B
    (KFs 10, 11): B's keyframes carry A's DESCRIPTORS and KF10's local
    geometry is an exact rigid copy of A's (so the pair-wise Sim3 is
    perfect). KF11 either continues the aliased copy (true-loop case) or
    observes unrelated structure (false-loop case). `R_B` overrides the
    scene-B rotation (the implied loop-correction rotation)."""
    key = jax.random.PRNGKey(0)
    m = ms.allocate(K, F, M)

    # scene A landmarks (body frame of KF0 ~ world origin)
    La = jnp.stack([
        jax.random.uniform(key, (N_L,), minval=-3, maxval=3),
        jax.random.uniform(jax.random.PRNGKey(1), (N_L,), minval=-2,
                           maxval=2),
        jax.random.uniform(jax.random.PRNGKey(2), (N_L,), minval=4,
                           maxval=8)], axis=-1)
    DA = jax.random.bernoulli(jax.random.PRNGKey(3), 0.5,
                              (N_L, 256)).astype(jnp.int8)

    # scene B: same local structure, far away, rotated (aliasing)
    if R_B is None:
        R_B = lie.so3_exp(jnp.asarray([0.0, 1.3, 0.0]))
    t_B = jnp.asarray([40.0, 0.0, 0.0])
    Lb = jnp.einsum("ij,mj->mi", R_B, La) + t_B

    # unrelated structure for the diverging continuation
    Lc = jnp.stack([
        jax.random.uniform(jax.random.PRNGKey(4), (N_L,), minval=-3,
                           maxval=3),
        jax.random.uniform(jax.random.PRNGKey(5), (N_L,), minval=-2,
                           maxval=2),
        jax.random.uniform(jax.random.PRNGKey(6), (N_L,), minval=4,
                           maxval=8)], axis=-1)
    Lc = jnp.einsum("ij,mj->mi", R_B, Lc) + t_B
    DC = jax.random.bernoulli(jax.random.PRNGKey(7), 0.5,
                              (N_L, 256)).astype(jnp.int8)

    pos = jnp.zeros((M, 3)).at[:N_L].set(La).at[N_L:2 * N_L].set(Lb) \
        .at[2 * N_L:3 * N_L].set(Lc)
    desc = jnp.zeros((M, 256), jnp.int8).at[:N_L].set(DA) \
        .at[N_L:2 * N_L].set(DA).at[2 * N_L:3 * N_L].set(DC)
    m = m._replace(mp_pos=pos, mp_desc=desc,
                   mp_valid=jnp.arange(M) < 3 * N_L,
                   n_mp=jnp.asarray(3 * N_L, jnp.int32))

    ids_a = list(range(N_L))
    ids_b = list(range(N_L, 2 * N_L))
    ids_c = list(range(2 * N_L, 3 * N_L))

    # scene-A keyframes 0..2 (small baseline: a covisible group)
    for k in range(3):
        t_k = jnp.asarray([0.1 * k, 0.0, 0.0])
        m = _observe(m, k, jnp.eye(3), t_k, ids_a, DA)
    # fill 3..9 with unrelated keyframes far from both scenes so slot 10
    # is outside the recent-exclusion window
    DF = jax.random.bernoulli(jax.random.PRNGKey(8), 0.5,
                              (N_L, 256)).astype(jnp.int8)
    for k in range(3, 10):
        m = _observe(m, k, jnp.eye(3),
                     jnp.asarray([0.0, 30.0 + k, 0.0]), ids_c, DF)
    # B keyframes: KF10 sees the aliased copy exactly like KF0 saw A
    m = _observe(m, 10, R_B, t_B, ids_b, DA)
    if second_consistent:
        t_11 = t_B + jnp.einsum("ij,j->i", R_B,
                                jnp.asarray([0.1, 0.0, 0.0]))
        m = _observe(m, 11, R_B, t_11, ids_b, DA)
    else:
        m = _observe(m, 11, R_B, t_B, ids_c, DC)
    # realistic scale ranges/normals (group projection verification gates
    # on the predicted pyramid level)
    return ms.update_mp_geometry(m, None)


# run_gba off: these tests target the VERIFICATION gates on an artificial
# two-scene map whose filler keyframes carry unrelated observations — a
# whole-map robust GBA on it legitimately tears the weld apart by
# re-gating those observations (the GBA path is covered by
# test_loop_closing.test_post_loop_gba_tightens_map on a real sequence)
CFG = loop_closing.LoopConfig(min_desc_matches=30, recent_exclude=6,
                              min_sim3_inliers=20, min_group_matches=25,
                              temporal_consistency=2, run_gba=False)


class TestLoopVerification:
    def test_false_loop_rejected(self):
        """Aliased single-KF coincidence: pair Sim3 is perfect, but the
        NEXT keyframe diverges — the temporal gate must reject."""
        m = build_aliased_map(second_consistent=False)
        lc = loop_closing.LoopCloser(None, K, CFG, rig=mono_rig(),
                                     img_w=W, img_h=H)
        m, closed = lc.on_keyframe(m, 10)
        assert not closed
        assert lc.pending is not None, \
            "KF10 should produce a pending hypothesis (pair Sim3 holds)"
        m, closed = lc.on_keyframe(m, 11)
        assert not closed
        assert lc.n_loops == 0
        assert lc.pending is None, "diverging KF must drop the hypothesis"

    def test_true_loop_still_closes(self):
        """The same scenario with a CONSISTENT second keyframe must pass
        the temporal gate and correct the map."""
        m = build_aliased_map(second_consistent=True)
        lc = loop_closing.LoopCloser(None, K, CFG, rig=mono_rig(),
                                     img_w=W, img_h=H)
        m, closed = lc.on_keyframe(m, 10)
        assert not closed and lc.pending is not None
        m2, closed = lc.on_keyframe(m, 11)
        assert closed
        assert lc.n_loops == 1
        # correction must weld B onto A: KF10 lands near KF0's pose
        d = float(jnp.linalg.norm(m2.kf_t[10] - m2.kf_t[0]))
        assert d < 2.0, d


class TestGravityGate:
    """Inertial loop acceptance must refuse corrections that tilt the
    gravity direction (reference: the "BAD LOOP" branch,
    src/LoopClosing.cc:307-335 — |phi_xy| < 0.008, |phi_z| < 0.349)."""

    def test_tilted_loop_refused(self):
        # scene-B rotation about y => the implied world correction is a
        # pure PITCH of 1.3 rad — a gravity-inconsistent hypothesis
        m = build_aliased_map(second_consistent=True)
        lc = loop_closing.LoopCloser(None, K, CFG, rig=mono_rig(),
                                     inertial=True, img_w=W, img_h=H)
        m, closed = lc.on_keyframe(m, 10)
        m, closed2 = lc.on_keyframe(m, 11)
        assert not closed and not closed2
        assert lc.n_loops == 0

    def test_yaw_only_loop_accepted(self):
        # same scenario with a 0.2 rad YAW correction (z-axis): within
        # both the tilt and yaw gates, so the loop must still close
        R_yaw = lie.so3_exp(jnp.asarray([0.0, 0.0, 0.2]))
        m = build_aliased_map(second_consistent=True, R_B=R_yaw)
        lc = loop_closing.LoopCloser(None, K, CFG, rig=mono_rig(),
                                     inertial=True, img_w=W, img_h=H)
        m, closed = lc.on_keyframe(m, 10)
        m2, closed2 = lc.on_keyframe(m, 11)
        assert closed2
        assert lc.n_loops == 1
        # the 4DoF (yaw-only) graph leaves more residual than the Sim3
        # solve on this artificial 40 m weld; the gate-acceptance is the
        # claim under test — just require most of the gap closed
        d = float(jnp.linalg.norm(m2.kf_t[10] - m2.kf_t[0]))
        assert d < 10.0, d


class TestPersistentLoopEdges:
    """Accepted loops leave a permanent edge in the map (reference:
    KeyFrame::mspLoopEdges, KeyFrame.h:216-243)."""

    def _closed_map(self):
        m = build_aliased_map(second_consistent=True)
        lc = loop_closing.LoopCloser(None, K, CFG, rig=mono_rig(),
                                     img_w=W, img_h=H)
        m, _ = lc.on_keyframe(m, 10)
        m2, closed = lc.on_keyframe(m, 11)
        assert closed
        return m2

    def test_edge_recorded(self):
        m2 = self._closed_map()
        assert int(m2.n_loop) == 1
        assert bool(m2.loop_valid[0])
        i, j = int(m2.loop_i[0]), int(m2.loop_j[0])
        assert j == 11 and i in (0, 1, 2), (i, j)

    def test_edge_survives_compaction(self):
        m2 = self._closed_map()
        i_old, j_old = int(m2.loop_i[0]), int(m2.loop_j[0])
        # cull an unrelated keyframe below both endpoints -> slots shift
        kill = 5
        m3 = m2._replace(kf_valid=m2.kf_valid.at[kill].set(False))
        m4, _, new_of_old = ms.compact_keyframes(m3)
        assert bool(m4.loop_valid[0])
        assert int(m4.loop_i[0]) == int(new_of_old[i_old])
        assert int(m4.loop_j[0]) == j_old - 1  # one slot below was culled

    def test_edge_dies_with_endpoint(self):
        m2 = self._closed_map()
        j_old = int(m2.loop_j[0])
        m3 = m2._replace(kf_valid=m2.kf_valid.at[j_old].set(False))
        m4, _, _ = ms.compact_keyframes(m3)
        assert not bool(m4.loop_valid[0])

    def test_decimation_protects_endpoints(self):
        m2 = self._closed_map()
        i_old = int(m2.loop_i[0])
        # decimation over the old half would normally hit odd slots;
        # force the endpoint into the vulnerable set and check protection
        m3, drop = ms.decimate_keyframes(m2, int(m2.n_kf) - 1,
                                         keep_recent=1, keep_first=0)
        assert not bool(drop[i_old])
        assert bool(m3.kf_valid[i_old])
