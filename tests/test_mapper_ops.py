"""Mapper maintenance ops: landmark fusion, landmark/keyframe culling,
settings parsing."""

import numpy as np
import jax
import jax.numpy as jnp

from openmavis_tpu.io import settings as settings_mod
from openmavis_tpu.pipeline import tracking
from openmavis_tpu.slam_map import map_state as ms


def small_map(K=6, F=8, M=32):
    return ms.allocate(K, F, M)


class TestFusion:
    def test_duplicate_merged(self):
        m = small_map()
        desc = jax.random.bernoulli(jax.random.PRNGKey(0), 0.5,
                                    (256,)).astype(jnp.int8)
        # old landmark 0 and a fresh duplicate landmark 1 (same pos/desc)
        m = m._replace(
            mp_pos=m.mp_pos.at[0].set(jnp.asarray([1.0, 0, 5.0]))
                           .at[1].set(jnp.asarray([1.001, 0, 5.0])),
            mp_desc=m.mp_desc.at[0].set(desc).at[1].set(desc),
            mp_valid=m.mp_valid.at[:2].set(True),
            mp_first_kf=m.mp_first_kf.at[1].set(3),
            n_mp=jnp.asarray(2, jnp.int32),
            kf_obs=m.kf_obs.at[3, 0].set(1),
            kf_valid=m.kf_valid.at[3].set(True),
            kf_feat_valid=m.kf_feat_valid.at[3, 0].set(True))
        out = tracking.fuse_new_landmarks(m, jnp.asarray(3), cap=8)
        assert not bool(out.mp_valid[1])      # duplicate killed
        assert bool(out.mp_valid[0])
        assert int(out.kf_obs[3, 0]) == 0     # observation re-pointed

    def test_distinct_kept(self):
        m = small_map()
        d0 = jnp.zeros((256,), jnp.int8)
        d1 = jnp.ones((256,), jnp.int8)
        m = m._replace(
            mp_pos=m.mp_pos.at[0].set(jnp.asarray([1.0, 0, 5.0]))
                           .at[1].set(jnp.asarray([3.0, 1, 7.0])),
            mp_desc=m.mp_desc.at[0].set(d0).at[1].set(d1),
            mp_valid=m.mp_valid.at[:2].set(True),
            mp_first_kf=m.mp_first_kf.at[1].set(3),
            n_mp=jnp.asarray(2, jnp.int32))
        out = tracking.fuse_new_landmarks(m, jnp.asarray(3), cap=8)
        assert bool(out.mp_valid[1])


class TestCulling:
    def test_landmark_cull(self):
        m = small_map()
        m = m._replace(
            mp_valid=m.mp_valid.at[:2].set(True),
            mp_visible=m.mp_visible.at[0].set(20).at[1].set(20),
            mp_found=m.mp_found.at[0].set(1).at[1].set(18),
            mp_first_kf=m.mp_first_kf.at[:2].set(0))
        out = tracking.cull_landmarks(m, jnp.asarray(5))
        assert not bool(out.mp_valid[0])   # ratio 0.05 -> culled
        assert bool(out.mp_valid[1])       # ratio 0.9 -> kept

    def test_keyframe_cull(self):
        K, F, M = 8, 8, 32
        m = small_map(K, F, M)
        # landmarks 0..7 observed by KFs 2,3,4,5 all (redundant KF 3),
        # KF 6 observes unique landmarks 8..15
        obs = jnp.full((K, F), -1, jnp.int32)
        for k in [2, 3, 4, 5]:
            obs = obs.at[k].set(jnp.arange(8, dtype=jnp.int32))
        obs = obs.at[6].set(jnp.arange(8, 16, dtype=jnp.int32))
        m = m._replace(
            kf_obs=obs,
            kf_valid=m.kf_valid.at[2:7].set(True),
            kf_feat_valid=jnp.ones((K, F), bool),
            mp_valid=m.mp_valid.at[:16].set(True),
            n_kf=jnp.asarray(7, jnp.int32))
        out = tracking.cull_keyframes(m, jnp.asarray(20), keep_recent=2)
        # one of the redundant KFs 2..5 culled, KF 6 kept
        assert int(out.kf_valid[2:6].sum()) == 3
        assert bool(out.kf_valid[6])


class TestSettings:
    def test_parse_roundtrip(self):
        cfg = settings_mod.example_settings(n_cams=2)
        cfg["Camera2"]["T_b_c"] = np.block(
            [[np.eye(3), np.asarray([[0.2], [0.0], [0.0]])],
             [np.zeros((1, 3)), np.ones((1, 1))]]).tolist()
        s = settings_mod.load_settings(cfg)
        rig = s["rig"]
        assert rig.params.shape == (2, 8)
        # camera 2 sits 0.2m along body x: t_cb = -R^T t_bc
        np.testing.assert_allclose(np.asarray(rig.t_cb[1]),
                                   [-0.2, 0, 0], atol=1e-6)
        assert s["orb"].n_features == 512
        assert s["imu_noise"] is not None
