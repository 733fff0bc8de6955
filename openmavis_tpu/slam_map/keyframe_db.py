"""Keyframe database: place recognition as a dense BoW score matmul.

TPU-native replacement for the reference's KeyFrameDatabase (reference:
src/KeyFrameDatabase.cc — BoW inverted file with shared-word counting,
covisibility-group score accumulation, DetectNBestCandidates at .cc:581,
DetectRelocalizationCandidates at .cc:715). The inverted file becomes a
dense [K, n_words] tf-idf matrix; a query is one matvec on the MXU; the
covisibility-consistency gating uses the on-demand covisibility matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import map_state as ms
from . import vocabulary as voc


class KeyframeDB(NamedTuple):
    bow: jnp.ndarray      # [K, n_words] L1-normalized tf-idf per keyframe
    valid: jnp.ndarray    # [K]


def allocate(max_kf: int, n_words: int) -> KeyframeDB:
    return KeyframeDB(bow=jnp.zeros((max_kf, n_words), jnp.float32),
                      valid=jnp.zeros((max_kf,), bool))


def add(db: KeyframeDB, slot, bow_vec) -> KeyframeDB:
    return KeyframeDB(bow=db.bow.at[slot].set(bow_vec),
                      valid=db.valid.at[slot].set(True))


@jax.jit
def query(db: KeyframeDB, bow_vec: jnp.ndarray,
          exclude: jnp.ndarray, min_score: jnp.ndarray):
    """Loop/relocalization candidates by BoW similarity.

    Args:
      bow_vec: [n_words] query.
      exclude: [K] bool — connected/recent keyframes to skip
        (the reference excludes the covisibility group of the query,
        KeyFrameDatabase.cc:589-607).
      min_score: score floor (the reference uses the minimum score to the
        query's covisible keyframes).
    Returns (scores [K], top3 idx [3], top3 ok [3]).
    """
    scores = voc.l1_score(db.bow, bow_vec[None, :])
    scores = jnp.where(db.valid & ~exclude, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(scores, 3)
    ok = top_scores > jnp.maximum(min_score, 0.0)
    return scores, top_idx, ok


def min_covisible_score(db: KeyframeDB, bow_vec, cov_row,
                        cov_threshold: int = 15):
    """Reference semantics (LoopClosing.cc / KeyFrameDatabase.cc:589): the
    candidate score floor is the min BoW score between the query and its
    covisible keyframes (>= cov_threshold shared points)."""
    neigh = cov_row >= cov_threshold
    scores = voc.l1_score(db.bow, bow_vec[None, :])
    neigh_scores = jnp.where(neigh & db.valid, scores, jnp.inf)
    mn = jnp.min(neigh_scores)
    return jnp.where(jnp.isfinite(mn), mn, 0.0)
