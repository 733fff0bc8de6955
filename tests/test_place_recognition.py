"""Vocabulary, keyframe DB, and pose-graph tests."""

import numpy as np
import jax
import jax.numpy as jnp

from openmavis_tpu.geometry import lie
from openmavis_tpu.optim import pose_graph
from openmavis_tpu.slam_map import keyframe_db, vocabulary


def random_desc(key, n):
    return jax.random.bernoulli(key, 0.5, (n, 256)).astype(jnp.int8)


def perturb(desc, key, flips=10):
    noise = jax.random.bernoulli(key, flips / 256.0, desc.shape)
    return jnp.abs(desc - noise.astype(jnp.int8))


class TestVocabulary:
    def test_train_and_transform(self):
        key = jax.random.PRNGKey(0)
        desc = random_desc(key, 2000)
        vocab = vocabulary.train(np.asarray(desc), k=6, levels=3, iters=4)
        assert vocab.n_words == 6 ** 3
        v = vocabulary.transform(vocab, desc[:300],
                                 jnp.ones(300, bool))
        assert abs(float(jnp.sum(jnp.abs(v))) - 1.0) < 1e-4

    def test_similar_images_score_higher(self):
        key = jax.random.PRNGKey(1)
        desc_a = random_desc(key, 1500)
        vocab = vocabulary.train(np.asarray(desc_a), k=6, levels=3)
        img1 = desc_a[:300]
        img1_again = perturb(img1, jax.random.PRNGKey(2), flips=8)
        img_other = random_desc(jax.random.PRNGKey(3), 300)
        ones = jnp.ones(300, bool)
        v1 = vocabulary.transform(vocab, img1, ones)
        v2 = vocabulary.transform(vocab, img1_again, ones)
        v3 = vocabulary.transform(vocab, img_other, ones)
        s_same = float(vocabulary.l1_score(v1, v2))
        s_diff = float(vocabulary.l1_score(v1, v3))
        # uniform random descriptors give a high similarity floor at this
        # vocab size; the discriminative signal is the separation
        assert s_same > s_diff + 0.15, (s_same, s_diff)

    def test_word_ids_stable_under_noise(self):
        key = jax.random.PRNGKey(4)
        desc = random_desc(key, 1000)
        vocab = vocabulary.train(np.asarray(desc), k=6, levels=2)
        w1 = vocabulary.word_ids(vocab, desc[:200])
        w2 = vocabulary.word_ids(
            vocab, perturb(desc[:200], jax.random.PRNGKey(5), flips=4))
        assert float((w1 == w2).mean()) > 0.6


class TestKeyframeDB:
    def test_query_finds_revisit(self):
        key = jax.random.PRNGKey(6)
        base = random_desc(key, 3000)
        vocab = vocabulary.train(np.asarray(base), k=6, levels=3)
        ones = jnp.ones(300, bool)
        db = keyframe_db.allocate(16, vocab.n_words)
        views = []
        for i in range(8):
            view = base[i * 300:(i + 1) * 300]
            views.append(view)
            db = keyframe_db.add(
                db, i, vocabulary.transform(vocab, view, ones))
        # query = noisy revisit of keyframe 2
        q = vocabulary.transform(
            vocab, perturb(views[2], jax.random.PRNGKey(7), 8), ones)
        exclude = jnp.zeros(16, bool).at[7].set(True)  # "current" KF
        scores, top, ok = keyframe_db.query(db, q, exclude,
                                            jnp.asarray(0.0))
        assert int(top[0]) == 2
        assert bool(ok[0])


class TestPoseGraph:
    def test_loop_closure_corrects_drift(self):
        """Odometry chain with accumulated drift + one loop edge: after
        optimization the loop must close (first ~= last pose)."""
        K = 20
        rng = np.random.default_rng(0)
        # ground truth: circle
        s_gt = np.ones(K, np.float32)
        R_gt, t_gt = [], []
        for k in range(K):
            ang = 2 * np.pi * k / K
            R_gt.append(np.asarray(lie.so3_exp(
                jnp.asarray([0, 0, ang], dtype=jnp.float32))))
            t_gt.append(np.asarray([np.cos(ang), np.sin(ang), 0.0],
                                   dtype=np.float32))
        R_gt = np.stack(R_gt)
        t_gt = np.stack(t_gt)

        # drifted estimate: integrate noisy relative motions
        s_est = [1.0]
        R_est = [R_gt[0]]
        t_est = [t_gt[0]]
        for k in range(1, K):
            dR = R_gt[k] @ R_gt[k - 1].T
            dt_ = t_gt[k] - dR @ t_gt[k - 1]
            # noise + slight scale drift
            dR = dR @ np.asarray(lie.so3_exp(jnp.asarray(
                0.02 * rng.standard_normal(3), dtype=jnp.float32)))
            dt_ = dt_ + 0.02 * rng.standard_normal(3).astype(np.float32)
            ds = 1.01
            s_est.append(s_est[-1] * ds)
            R_est.append(dR @ R_est[-1])
            t_est.append(ds * (dR @ t_est[-1]) + dt_)
        s_est = jnp.asarray(np.asarray(s_est, np.float32))
        R_est = jnp.asarray(np.stack(R_est))
        t_est = jnp.asarray(np.stack(t_est))

        # edges: sequential (from drifted odometry, i.e. consistent with the
        # estimate) + loop edge K-1 -> 0 with the TRUE relative transform
        seq = pose_graph.sequential_edges(s_est, R_est, t_est,
                                          jnp.asarray(K), K)
        dR_loop = R_gt[0] @ R_gt[K - 1].T
        dt_loop = t_gt[0] - dR_loop @ t_gt[K - 1]
        loop = pose_graph.PoseGraphEdges(
            i=jnp.asarray([K - 1]), j=jnp.asarray([0]),
            s=jnp.asarray([1.0]),
            R=jnp.asarray(dR_loop)[None],
            t=jnp.asarray(dt_loop)[None],
            weight=jnp.asarray([5.0]), valid=jnp.asarray([True]))
        edges = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b]), seq, loop)

        fixed = jnp.zeros(K, bool).at[0].set(True)
        s_o, R_o, t_o, chi = pose_graph.optimize_pose_graph(
            s_est, R_est, t_est, edges, fixed, jnp.ones(K, bool),
            iters=15)

        # loop closed: residual of the loop edge should be small
        r_before = float(jnp.linalg.norm(lie.sim3_log(
            *lie.sim3_compose(*lie.sim3_inverse(
                jnp.asarray([1.0])[0], jnp.asarray(dR_loop),
                jnp.asarray(dt_loop)),
                *lie.sim3_compose(s_est[0], R_est[0], t_est[0],
                                  *lie.sim3_inverse(s_est[K-1],
                                                    R_est[K-1],
                                                    t_est[K-1]))))))
        r_after = float(jnp.linalg.norm(lie.sim3_log(
            *lie.sim3_compose(*lie.sim3_inverse(
                jnp.asarray([1.0])[0], jnp.asarray(dR_loop),
                jnp.asarray(dt_loop)),
                *lie.sim3_compose(s_o[0], R_o[0], t_o[0],
                                  *lie.sim3_inverse(s_o[K-1], R_o[K-1],
                                                    t_o[K-1]))))))
        assert r_after < 0.1 * r_before, (r_before, r_after)
        # scale drift removed
        assert abs(float(s_o[K - 1]) - 1.0) < 0.05
