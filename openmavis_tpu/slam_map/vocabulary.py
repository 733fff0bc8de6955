"""Binary visual vocabulary: hierarchical k-medians over ORB descriptors.

TPU-native replacement for DBoW2's TemplatedVocabulary (reference:
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h — hierarchical k-means tree,
k=10, L=6 for the ORB vocabulary; tf-idf BowVector; L1 scoring). Idiom
shifts (SURVEY.md §2.2):

* the tree is dense arrays (per-level center tables), not node objects;
* training clusters EVERY node of a level simultaneously — one batched
  k-medians (majority-bit centroids, Hamming assignment via the MXU
  Hamming matmul) per level;
* transform (descriptor -> word) is a level-wise batched argmin descent;
* BoW vectors are dense [n_words] tf-idf arrays, so database scoring is a
  matmul (see keyframe_db.py).

The reference repo ships no vocabulary at all (SURVEY.md §6: Vocabulary/ is
absent; build.sh expects a separately downloaded ORBvoc); training our own
is the supported path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import matcher


class Vocabulary(NamedTuple):
    """Dense vocabulary tree: level l has k^(l+1) nodes."""
    centers: tuple          # per level: [k^(l+1), 256] int8 centers
    idf: jnp.ndarray        # [n_words] inverse document frequency
    k: int                  # branching factor

    @property
    def n_words(self):
        return self.centers[-1].shape[0]


def _assign(desc, centers_per_node, node_of_desc):
    """desc [N,256]; centers_per_node [n_nodes, k, 256]; node_of_desc [N].
    Returns child index [N] in 0..k-1 by Hamming argmin."""
    cen = centers_per_node[node_of_desc]          # [N, k, 256]
    d = jnp.sum(jnp.abs(cen.astype(jnp.int32)
                        - desc[:, None, :].astype(jnp.int32)), axis=-1)
    return jnp.argmin(d, axis=-1)


def train(desc: np.ndarray, k: int = 10, levels: int = 3,
          iters: int = 6, seed: int = 0) -> Vocabulary:
    """Train a k^levels-word vocabulary from [N, 256] {0,1} descriptors.

    All nodes of a level are clustered in one batched loop: descriptors
    carry their parent-node id; centroids are per-(node, child) majority
    bits; assignment is Hamming argmin among the k sibling centers.
    """
    desc = np.asarray(desc, np.int8)
    n = len(desc)
    rng = np.random.default_rng(seed)
    desc_j = jnp.asarray(desc)

    node = jnp.zeros((n,), jnp.int32)     # parent node id at current level
    centers_list = []
    n_nodes = 1
    for lv in range(levels):
        # init: random member of each node for each child slot
        perm = rng.permutation(n)
        init = np.zeros((n_nodes, k, 256), np.int8)
        node_np = np.asarray(node)
        for c in range(n_nodes):
            members = perm[node_np[perm] == c]
            if len(members) == 0:
                members = perm[:k]
            sel = members[(np.arange(k) * 2654435761) % len(members)]
            init[c] = desc[sel]
        centers = jnp.asarray(init)

        @jax.jit
        def em(centers, node):
            def step(centers, _):
                child = _assign(desc_j, centers, node)
                slot = node * k + child
                ones = jnp.ones((n,), jnp.float32)
                cnt = jnp.zeros((n_nodes * k,), jnp.float32).at[slot].add(
                    ones)
                bit_sum = jnp.zeros((n_nodes * k, 256),
                                    jnp.float32).at[slot].add(
                    desc_j.astype(jnp.float32))
                new = (bit_sum > 0.5 * cnt[:, None]).astype(jnp.int8)
                keep = (cnt > 0)[:, None]
                flat = jnp.where(keep, new, centers.reshape(-1, 256))
                return flat.reshape(n_nodes, k, 256), None
            centers, _ = jax.lax.scan(step, centers, None, length=iters)
            child = _assign(desc_j, centers, node)
            return centers, node * k + child

        centers, node = em(centers, node)
        centers_list.append(centers.reshape(n_nodes * k, 256))
        n_nodes *= k

    # idf from training counts
    word = np.asarray(node)
    counts = np.bincount(word, minlength=n_nodes).astype(np.float64)
    idf = np.log(max(n, 1) / np.maximum(counts, 1.0)).astype(np.float32)
    return Vocabulary(centers=tuple(centers_list), idf=jnp.asarray(idf),
                      k=k)


def transform(vocab: Vocabulary, desc: jnp.ndarray,
              valid: jnp.ndarray) -> jnp.ndarray:
    """[F, 256] descriptors -> [n_words] L1-normalized tf-idf BoW vector."""
    n = desc.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    k = vocab.k
    for centers in vocab.centers:
        cen = centers.reshape(-1, k, 256)
        child = _assign(desc, cen, node)
        node = node * k + child
    w = vocab.n_words
    tf = jnp.zeros((w,), jnp.float32).at[node].add(
        valid.astype(jnp.float32))
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-9)


def word_ids(vocab: Vocabulary, desc: jnp.ndarray) -> jnp.ndarray:
    """[F, 256] -> [F] leaf word id (for BoW-gated feature matching)."""
    n = desc.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    k = vocab.k
    for centers in vocab.centers:
        cen = centers.reshape(-1, k, 256)
        node = node * k + _assign(desc, cen, node)
    return node


def l1_score(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 similarity: s = 1 - 0.5 |v1 - v2|_1 (vectors L1-normalized).

    (reference: Thirdparty/DBoW2 ScoringObject.cpp L1Scoring)
    Batched over leading dims of v1.
    """
    return 1.0 - 0.5 * jnp.sum(jnp.abs(v1 - v2), axis=-1)


def transform_sparse(vocab: Vocabulary, desc: jnp.ndarray,
                     valid: jnp.ndarray, top_w: int):
    """[F, 256] descriptors -> word-sparse BoW: (word [W] i32, wt [W] f32).

    The L1-normalized tf-idf vector of a keyframe has at most F nonzeros,
    so a (word-id, weight) pair list of capacity `top_w` represents it
    exactly (or keeps the heaviest words when the bank has more distinct
    words than slots). This is the storage DBoW2's inverted file implies —
    per-image word lists — without the dense [K, n_words] matrix the
    dense path materializes (VERDICT r2 missing #5; reference:
    src/KeyFrameDatabase.cc:581 inverted-file scoring).

    Padding: unused slots carry wt = 0 (word id 0), which contributes
    nothing to the min-intersection score.
    """
    node = jnp.zeros((desc.shape[0],), jnp.int32)
    k = vocab.k
    for centers in vocab.centers:
        cen = centers.reshape(-1, k, 256)
        node = node * k + _assign(desc, cen, node)
    w = vocab.n_words
    tf = jnp.zeros((w,), jnp.float32).at[node].add(
        valid.astype(jnp.float32))
    v = tf * vocab.idf
    v = v / jnp.maximum(jnp.sum(v), 1e-9)
    eff = min(top_w, w)       # tiny vocabularies: fewer words than slots
    wt, word = jax.lax.top_k(v, eff)
    if eff < top_w:
        pad = top_w - eff
        word = jnp.concatenate([word, jnp.zeros((pad,), word.dtype)])
        wt = jnp.concatenate([wt, jnp.zeros((pad,), wt.dtype)])
    return word.astype(jnp.int32), jnp.maximum(wt, 0.0)


def save(path: str, vocab: Vocabulary) -> str:
    """Persist a trained vocabulary (npz) with a content hash.

    The reference ships a pre-trained 1M-word ORBvoc and binds loaded
    maps to it by MD5 (System.cc:1520-1556 ComputeMD5 of the vocabulary
    file); here the hash is stored inside the file and returned so
    callers can bind artifacts the same way. Returns the hex digest.
    """
    import hashlib

    arrays = {f"centers_{i}": np.asarray(c)
              for i, c in enumerate(vocab.centers)}
    arrays["idf"] = np.asarray(vocab.idf)
    blob = b"".join(a.tobytes() for a in arrays.values())
    digest = hashlib.md5(blob).hexdigest()
    np.savez_compressed(path, k=np.asarray(vocab.k),
                        levels=np.asarray(len(vocab.centers)),
                        md5=np.asarray(digest), **arrays)
    return digest


def load(path: str) -> tuple:
    """Load a persisted vocabulary. Returns (Vocabulary, md5 hex digest);
    raises ValueError if the stored hash does not match the content
    (the reference refuses a map whose vocabulary checksum differs)."""
    import hashlib

    with np.load(path) as data:
        levels = int(data["levels"])
        centers = tuple(jnp.asarray(data[f"centers_{i}"])
                        for i in range(levels))
        idf = jnp.asarray(data["idf"])
        k = int(data["k"])
        stored = str(data["md5"])
        blob = b"".join(np.asarray(data[f"centers_{i}"]).tobytes()
                        for i in range(levels))
        blob += np.asarray(data["idf"]).tobytes()
    digest = hashlib.md5(blob).hexdigest()
    if digest != stored:
        raise ValueError(f"vocabulary {path}: content hash {digest} != "
                         f"stored {stored} (corrupt or tampered file)")
    return Vocabulary(centers=centers, idf=idf, k=k), digest


def l1_score_sparse(word_a, wt_a, word_b, wt_b, n_words: int):
    """L1 similarity between two word-sparse BoW vectors.

    For L1-normalized nonnegative vectors, 1 - 0.5|u - v|_1 reduces to the
    min-intersection  sum_w min(u_w, v_w)  over shared words.
    """
    dense_a = jnp.zeros((n_words,), wt_a.dtype).at[word_a].max(wt_a)
    return jnp.sum(jnp.minimum(wt_b, dense_a[word_b]))
