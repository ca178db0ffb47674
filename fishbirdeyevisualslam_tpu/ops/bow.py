"""Bag-of-visual-words place recognition as batched device ops.

The reference vendors DBoW2: an offline-trained vocabulary tree (k=10, L=6)
walked per descriptor on the CPU, producing a sparse tf-idf BowVector scored
with an L1 metric (``TemplatedVocabulary::transform/score``,
``Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:135-162``) and a level-up
FeatureVector used to gate matching candidates (``SearchByBoW``).  The
KeyFrameDatabase (``src/KeyFrameDatabase.cc:76-196``) is an inverted file over
words — a CPU-side sparsity optimization.

Here (SURVEY.md §2.2): a trained k=10, L=4 vocabulary (``ops/vocab.py``,
``scripts/train_vocab.py``) quantizes descriptors by a batched MXU descent
(one similarity matmul against every tree node + 4 gathered K-way argmax
steps); scoring evaluates the query against EVERY keyframe at once with dense
tf-idf histograms — the inverted file is unnecessary when the whole database
is one batched op.

Round 1 used 16-bit bit-sampling LSH words here; its discrimination was weak
enough that loop detection needed a position-proximity crutch.  The trained
vocabulary replaces it (VERDICT.md round-1 missing #1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fishbirdeyevisualslam_tpu.ops import vocab as vocab_mod

N_WORDS = vocab_mod.N_WORDS
NODE_DIV = vocab_mod.NODE_DIV


def word_ids(desc_pm1) -> jnp.ndarray:
    """(N, 256) ±1 descriptors -> (N,) int32 leaf word ids via the batched
    vocabulary descent (``TemplatedVocabulary::transform`` analog)."""
    v = vocab_mod.load_vocabulary()
    return vocab_mod.descend(desc_pm1, jnp.asarray(v.centers_pm1))


def node_ids(words) -> jnp.ndarray:
    """Depth-2 ancestor node per word — the FeatureVector gate for
    ``SearchByBoW``-style candidate restriction."""
    return words // NODE_DIV


def node_gate_mask(words_a, valid_a, words_b, valid_b) -> jnp.ndarray:
    """(Na, Nb) compat mask: same vocabulary node (SearchByBoW candidate gate)."""
    na = node_ids(words_a)
    nb = node_ids(words_b)
    return (na[:, None] == nb[None, :]) & valid_a[:, None] & valid_b[None, :]


def _tfidf_hist(words, valid, idf) -> jnp.ndarray:
    """(F,) words -> (N_WORDS,) L1-normalized tf-idf histogram."""
    w = jnp.where(valid, idf[jnp.clip(words, 0, N_WORDS - 1)], 0.0)
    hist = jnp.zeros((N_WORDS,), jnp.float32).at[
        jnp.where(valid, words, 0)].add(w)
    return hist / jnp.maximum(hist.sum(), 1e-9)


def bow_vector(words, valid) -> jnp.ndarray:
    """Public tf-idf vector of one descriptor set (BowVector analog)."""
    return _tfidf_hist(words, valid, jnp.asarray(vocab_mod.load_vocabulary().idf))


def score_against_keyframes(q_words, q_valid, kf_words, kf_valid) -> jnp.ndarray:
    """DBoW2 L1 similarity of one query against every KF at once: (K,) in [0,1].

    Both sides are L1-normalized tf-idf vectors; the DBoW2 L1 score
    ``1 - 0.5 |v - w|_1`` equals ``sum_i min(v_i, w_i)`` for normalized
    non-negative vectors.  All KF histograms are built by ONE scatter-add over
    the (K, F) word table — the batched replacement for the inverted file.
    """
    idf = jnp.asarray(vocab_mod.load_vocabulary().idf)
    q_hist = _tfidf_hist(q_words, q_valid, idf)            # (W,)
    K, F = kf_words.shape
    rows = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, F))
    w = jnp.where(kf_valid, idf[jnp.clip(kf_words, 0, N_WORDS - 1)], 0.0)
    hists = jnp.zeros((K, N_WORDS), jnp.float32).at[
        rows, jnp.where(kf_valid, kf_words, 0)].add(w)
    hists = hists / jnp.maximum(hists.sum(axis=1, keepdims=True), 1e-9)
    return jnp.sum(jnp.minimum(q_hist[None, :], hists), axis=1)
