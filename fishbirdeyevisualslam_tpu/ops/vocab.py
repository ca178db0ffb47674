"""Vocabulary-tree place recognition: batched descent as MXU ops.

The reference vendors DBoW2 (``Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:
135-162``): an offline-trained k=10, L=6 vocabulary tree walked per descriptor
on the CPU (each step = k Hamming distances + argmin), producing sparse tf-idf
``BowVector``s scored with an L1 metric and a level-up ``FeatureVector`` used
to gate matching candidates (``SearchByBoW``).

The TPU-native equivalent (SURVEY.md §2.2) replaces the pointer walk with one
dense similarity matmul + L tiny gathered argmax steps:

  * all tree-node centers (every level, concatenated) form ONE (T, 256) ±1
    matrix; similarity of N query descriptors to every node is a single
    (N, 256) @ (256, T) MXU matmul (T ≈ 11k for k=10, L=4 → ~1.5 GFLOP at
    N=2048, microseconds on the MXU);
  * the per-level K-way Hamming argmin then runs on the score matrix with
    ``take_along_axis`` gathers of each descriptor's k child columns — no
    descriptor data is touched again.

The vocabulary is trained offline by binary k-majority clustering over ORB
descriptors extracted from rendered sequences (``scripts/train_vocab.py``) and
shipped as an ``.npz`` in ``fishbirdeyevisualslam_tpu/data/``.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

K_BRANCH = 10
DEPTH = 4
N_WORDS = K_BRANCH ** DEPTH            # 10000 leaves
# FeatureVector gate nodes: depth-2 ancestors (DBoW2 ORB setup uses levelsup=4
# of L=6 -> depth-2 nodes = k^2 = 100; same depth here).
NODE_DIV = K_BRANCH ** (DEPTH - 2)     # word // 100 -> 100 gate nodes
N_NODES_TOTAL = sum(K_BRANCH ** (l + 1) for l in range(DEPTH))  # 11110

_VOCAB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "data",
                           "orb_vocab.npz")


class Vocabulary(NamedTuple):
    centers_pm1: np.ndarray    # (N_NODES_TOTAL, 256) bf16 ±1, levels concatenated
    idf: np.ndarray            # (N_WORDS,) float32 inverse document frequency


@functools.lru_cache(maxsize=1)
def load_vocabulary(path: str = _VOCAB_PATH) -> Vocabulary:
    """Load the trained vocabulary (packed bits + idf).

    Returns NUMPY arrays on purpose: callers run inside jit traces, and caching
    a ``jnp`` array created during a trace would memoize a leaked tracer.  As
    numpy constants they are baked into each jitted program (XLA dedups)."""
    with np.load(os.path.abspath(path)) as z:
        packed = z["centers_packed"]       # (T, 8) uint32
        idf = z["idf"].astype(np.float32)  # (N_WORDS,)
    assert packed.shape == (N_NODES_TOTAL, 8), packed.shape
    assert idf.shape == (N_WORDS,), idf.shape
    w = np.arange(32, dtype=np.uint32)
    bits = ((packed[:, :, None] >> w[None, None, :]) & 1).reshape(-1, 256)
    pm1 = (bits.astype(np.float32) * 2.0 - 1.0).astype(jnp.bfloat16)
    return Vocabulary(pm1, idf)


def vocabulary_available(path: str = _VOCAB_PATH) -> bool:
    return os.path.exists(os.path.abspath(path))


def descend(desc_pm1, centers_pm1) -> jnp.ndarray:
    """(N, 256) ±1 descriptors -> (N,) int32 leaf word ids.

    One MXU matmul against every node center, then DEPTH gathered K-way argmax
    steps over the score matrix (``TemplatedVocabulary::transform`` semantics:
    max dot == min Hamming at every branch).
    """
    scores = jnp.dot(desc_pm1, centers_pm1.T,
                     preferred_element_type=jnp.float32)      # (N, T)
    n = desc_pm1.shape[0]
    node = jnp.zeros((n,), jnp.int32)
    off = 0
    ks = jnp.arange(K_BRANCH, dtype=jnp.int32)
    for level in range(DEPTH):
        idx = off + node[:, None] * K_BRANCH + ks[None, :]    # (N, k)
        s = jnp.take_along_axis(scores, idx, axis=1)
        node = node * K_BRANCH + jnp.argmax(s, axis=1).astype(jnp.int32)
        off += K_BRANCH ** (level + 1)
    return node


# --- host-side (numpy) descent used by the trainer and offline tools ---------

def descend_np(bits: np.ndarray, centers_pm1: np.ndarray) -> np.ndarray:
    """(N, 256) {0,1} uint8 -> (N,) int32 word ids, pure numpy."""
    pm1 = bits.astype(np.float32) * 2.0 - 1.0
    scores = pm1 @ centers_pm1.astype(np.float32).T
    n = bits.shape[0]
    node = np.zeros((n,), np.int32)
    off = 0
    for level in range(DEPTH):
        idx = off + node[:, None] * K_BRANCH + np.arange(K_BRANCH)[None, :]
        s = np.take_along_axis(scores, idx, axis=1)
        node = node * K_BRANCH + np.argmax(s, axis=1).astype(np.int32)
        off += K_BRANCH ** (level + 1)
    return node
