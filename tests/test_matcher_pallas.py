"""CI coverage for the TPU-only fused Pallas matcher (interpret mode).

The streaming pipeline routes EVERY descriptor match on TPU through
``matcher_pallas.masked_best2_fused`` (matcher.match_nn -> _use_pallas);
the test suite runs on a CPU mesh where that path is disabled. These tests
run the same kernel through the Pallas interpreter and assert bit-exact
agreement with the XLA reference path (`matcher.masked_best2`) — including
the flagship shapes (2048-query bank x 16384-landmark map) the round-2
bench crashed at.

Reference behavior being validated: ORBmatcher's best/second-best Hamming
search with admissibility masks (src/ORBmatcher.cc SearchByProjection /
SearchByBoW inner loops).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from openmavis_tpu.frontend import matcher, matcher_pallas


def _xla_reference(d1, d2, mask):
    dist = matcher.hamming_matrix(jnp.asarray(d1), jnp.asarray(d2))
    return matcher.masked_best2(dist, jnp.asarray(mask))


def _run_case(n, m, mask_p, seed):
    rng = np.random.RandomState(seed)
    d1 = (rng.rand(n, 256) > 0.5).astype(np.int8)
    d2 = (rng.rand(m, 256) > 0.5).astype(np.int8)
    mask = rng.rand(n, m) > mask_p
    pen = np.where(mask, 0.0, 2.0 * matcher_pallas.INVALID).astype(
        np.float32)
    bi_p, b_p, s_p = matcher_pallas.masked_best2_fused(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(pen),
        interpret=True)
    bi_x, b_x, s_x = _xla_reference(d1, d2, mask)
    has = np.asarray(b_x) < matcher_pallas.INVALID
    np.testing.assert_array_equal(np.asarray(bi_p)[has],
                                  np.asarray(bi_x)[has])
    np.testing.assert_array_equal(np.asarray(b_p)[has],
                                  np.asarray(b_x)[has])
    # rows with no admissible target must report >= INVALID
    assert np.all(np.asarray(b_p)[~has] >= matcher_pallas.INVALID)
    # second-best agrees wherever the XLA path found one
    has2 = np.asarray(s_x) < matcher_pallas.INVALID
    np.testing.assert_array_equal(np.asarray(s_p)[has2],
                                  np.asarray(s_x)[has2])


def test_small_shapes_exact():
    _run_case(n=96, m=200, mask_p=0.3, seed=0)


def test_unaligned_padding_rows_masked():
    # non-multiples of the tile sizes exercise the pad-with-INVALID path
    _run_case(n=130, m=517, mask_p=0.5, seed=1)


def test_all_masked_rows():
    d1 = np.zeros((64, 256), np.int8)
    d2 = np.ones((64, 256), np.int8)
    pen = np.full((64, 64), 2.0 * matcher_pallas.INVALID, np.float32)
    bi, b, s = matcher_pallas.masked_best2_fused(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(pen),
        interpret=True)
    assert np.all(np.asarray(b) >= matcher_pallas.INVALID)
    assert np.all(np.asarray(s) >= matcher_pallas.INVALID)


def test_tie_breaking_smallest_index():
    # identical target rows: best must be the smallest admissible column
    rng = np.random.RandomState(2)
    d1 = (rng.rand(8, 256) > 0.5).astype(np.int8)
    d2 = np.tile(d1[:1], (32, 1))
    pen = np.zeros((8, 32), np.float32)
    pen[:, :3] = 2.0 * matcher_pallas.INVALID   # forbid cols 0-2
    bi, b, s = matcher_pallas.masked_best2_fused(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(pen),
        interpret=True)
    assert int(np.asarray(bi)[0]) == 3
    assert int(np.asarray(b)[0]) == 0
    # second-best is the next column with the same distance
    assert int(np.asarray(s)[0]) == 0


@pytest.mark.slow
def test_flagship_shapes_exact():
    """2048-feature bank x 16384-landmark map — the exact shapes of the
    flagship streaming step's map->frame match (BENCH r2 crash site)."""
    _run_case(n=2048, m=16384, mask_p=0.7, seed=3)
