"""Bag-of-visual-words place recognition as batched device ops.

The reference vendors DBoW2: an offline-trained vocabulary tree (k=10, L=6, ~1M
words) walked per descriptor on the CPU, producing a sparse tf BowVector and a
level-4 FeatureVector used to gate matching (``TemplatedVocabulary::transform``,
``Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:135-162``).

A pointer-tree walk is the wrong shape for a TPU, and the trained vocabulary
file is not shipped.  The TPU-native equivalent keeps the *interface* (word ids,
tf scoring, node-gated matching) but computes words by bit-sampling LSH: 16
fixed descriptor bit positions form the word id (65536 words), a 10-bit subset
forms the "level-4 node" for ``SearchByBoW``-style candidate gating.  For two
ORB descriptors at Hamming distance h, P(same word) = (1 - h/256)^16 — ~0.7 at
matching-grade distances — the same locality invariant the vocabulary tree
provides, with zero compute beyond a gather.

Scoring: tf vectors are L1-normalized histograms; similarity is the DBoW2 L1
score  s(v, w) = 1 - 0.5 * |v - w|_1  evaluated against all keyframes at once
with one gather+segment-sum (equivalently 2 * sum_i min(v_i, w_i) ... identical
for L1-normalized non-negative vectors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_PLANES = 16
N_WORDS = 1 << N_PLANES       # 65536
NODE_SHIFT = 6                # node = word >> 6 -> 1024 nodes ("L4" gate)


@functools.lru_cache(maxsize=1)
def _bit_positions() -> np.ndarray:
    rng = np.random.RandomState(77020817)
    return rng.choice(256, N_PLANES, replace=False).astype(np.int32)


def word_ids(desc_pm1) -> jnp.ndarray:
    """(N, 256) +/-1 descriptors -> (N,) int32 word ids by sampling 16 fixed
    bit positions (bit-sampling LSH)."""
    pos = jnp.asarray(_bit_positions())
    bits = (desc_pm1[:, pos].astype(jnp.float32) > 0).astype(jnp.int32)
    weights = jnp.asarray((1 << np.arange(N_PLANES)).astype(np.int32))
    return jnp.sum(bits * weights[None, :], axis=-1)


def node_ids(words) -> jnp.ndarray:
    """Coarse grouping for matching candidate gates (FeatureVector analog)."""
    return words >> NODE_SHIFT


def node_gate_mask(words_a, valid_a, words_b, valid_b) -> jnp.ndarray:
    """(Na, Nb) compat mask: same vocabulary node (SearchByBoW candidate gate)."""
    na = node_ids(words_a)
    nb = node_ids(words_b)
    return (na[:, None] == nb[None, :]) & valid_a[:, None] & valid_b[None, :]


def score_against_keyframes(q_words, q_valid, kf_words, kf_valid) -> jnp.ndarray:
    """L1 BoW similarity of one query against every KF: (K,) in [0, 1].

    q_words (F,), kf_words (K, F) word ids with validity masks.  Both sides are
    L1-normalized tf histograms; s = sum_i min(q_i, k_i) equals the DBoW2
    L1-score up to the standard affine map.
    """
    F = q_words.shape[0]
    K = kf_words.shape[0]
    qw = q_valid.astype(jnp.float32)
    q_hist = jnp.zeros((N_WORDS,), jnp.float32).at[jnp.where(q_valid, q_words, 0)].add(qw)
    q_hist = q_hist / jnp.maximum(q_hist.sum(), 1.0)
    kw = kf_valid.astype(jnp.float32)
    k_count = jnp.maximum(kw.sum(axis=1), 1.0)  # (K,)
    # sum over features of min(q[word], k_tf[word]) requires per-KF histograms;
    # evaluate via gather: for each KF feature, its word's query tf, capped by
    # the KF's own tf at that word.  Build per-KF histograms sparsely:
    # contribution of word w in KF k = min(q_hist[w], tf_k[w]).  Compute tf_k[w]
    # by counting duplicates within the KF row.
    safe_words = jnp.where(kf_valid, kf_words, N_WORDS - 1)
    # count multiplicity of each word within its KF row: sort-free trick via
    # equality matrix would be (K,F,F) = big; instead use segment counting per row.
    def per_kf(words_row, valid_row):
        hist = jnp.zeros((N_WORDS,), jnp.float32).at[
            jnp.where(valid_row, words_row, 0)
        ].add(valid_row.astype(jnp.float32))
        hist = hist / jnp.maximum(hist.sum(), 1.0)
        return jnp.sum(jnp.minimum(q_hist, hist))

    return jax.vmap(per_kf)(safe_words, kf_valid)
