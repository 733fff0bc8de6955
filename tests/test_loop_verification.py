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


def build_aliased_map(second_consistent: bool):
    """Map with scene A (KFs 0-2) and a far-away aliased scene B
    (KFs 10, 11): B's keyframes carry A's DESCRIPTORS and KF10's local
    geometry is an exact rigid copy of A's (so the pair-wise Sim3 is
    perfect). KF11 either continues the aliased copy (true-loop case) or
    observes unrelated structure (false-loop case)."""
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
