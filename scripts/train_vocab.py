"""Offline vocabulary training: binary k-majority tree over own ORB descriptors.

The DBoW2 analog (``Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h`` training
path): recursive k-means over binary descriptors where the cluster "mean" is
the bitwise majority vote, k-means++-style seeding, idf weights from document
frequency over the training frames.  The corpus is ORB descriptors extracted
from rendered synthetic sequences (front + bird views, several worlds) — the
reference ships a vocabulary trained offline on unrelated imagery the same way.

Writes ``fishbirdeyevisualslam_tpu/data/orb_vocab.npz``:
  centers_packed (N_NODES_TOTAL, 8) uint32 — all levels concatenated
  idf            (N_WORDS,) float32
"""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
import argparse
import time

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
# persistent cache disabled on CPU: XLA:CPU AOT reload segfaults on this host
# (see tests/conftest.py)

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.io import synthetic
from fishbirdeyevisualslam_tpu.ops import features, orb, vocab


def collect_corpus(n_worlds=6, n_frames=14, seed0=100):
    """Extract ORB descriptors from rendered frames; returns (bits, doc_ids)."""
    cfg = SystemConfig()
    import jax.numpy as jnp
    all_bits, doc_ids = [], []
    doc = 0
    for w in range(n_worlds):
        world = synthetic.make_world(seed=seed0 + w)
        gt = synthetic.make_trajectory(n_frames, kind="circle" if w % 2 else "arc",
                                       step=0.6, seed=seed0 + w)
        for i in range(n_frames):
            front = synthetic.render_front(world, cfg, gt[i])
            bird = synthetic.render_bird(world, cfg, gt[i])
            for img in (front, bird):
                kp = features.extract(jnp.asarray(img, jnp.float32), cfg.orb,
                                      cfg.capacity.max_front_kp)
                bits = np.asarray(orb.unpack_bits(kp.desc))
                v = np.asarray(kp.valid)
                all_bits.append(bits[v])
                doc_ids.append(np.full(int(v.sum()), doc, np.int32))
                doc += 1
            print(f"world {w} frame {i}: {sum(len(b) for b in all_bits)} descriptors",
                  flush=True)
    return np.concatenate(all_bits), np.concatenate(doc_ids)


def kmajority(X_bits, k, rng, n_iters=8):
    """Cluster (n, 256) {0,1} bits into k binary centers (majority vote).
    Returns (centers_bits (k, 256), assign (n,))."""
    n = X_bits.shape[0]
    Xp = X_bits.astype(np.float32) * 2.0 - 1.0
    if n == 0:
        return np.zeros((k, 256), np.uint8), np.zeros((0,), np.int32)
    # k-means++ seeding on Hamming distance
    centers = np.empty((k, 256), np.float32)
    centers[0] = Xp[rng.randint(n)]
    d_min = 256.0 - Xp @ centers[0]  # 2*hamming
    for j in range(1, k):
        p = np.maximum(d_min, 1e-3)
        centers[j] = Xp[rng.choice(n, p=p / p.sum())]
        d_min = np.minimum(d_min, 256.0 - Xp @ centers[j])
    assign = np.zeros(n, np.int32)
    for _ in range(n_iters):
        sim = Xp @ centers.T                      # (n, k)
        assign = np.argmax(sim, axis=1)
        for j in range(k):
            sel = assign == j
            if not sel.any():
                # reseed from the point farthest from its center
                worst = np.argmin(sim[np.arange(n), assign])
                centers[j] = Xp[worst]
                assign[worst] = j
                continue
            maj = X_bits[sel].mean(axis=0) > 0.5
            centers[j] = maj.astype(np.float32) * 2.0 - 1.0
    return ((centers > 0).astype(np.uint8)), assign


def train_tree(bits, rng):
    """Recursive k-majority: returns centers_bits (N_NODES_TOTAL, 256)."""
    K, L = vocab.K_BRANCH, vocab.DEPTH
    n = bits.shape[0]
    levels = []          # per level: (K^(l+1), 256) uint8
    node_of = np.zeros(n, np.int32)   # current node id per descriptor
    for level in range(L):
        n_parents = K ** level
        centers_l = np.zeros((n_parents * K, 256), np.uint8)
        new_node = np.zeros(n, np.int32)
        for p in range(n_parents):
            sel = node_of == p
            Xs = bits[sel]
            if Xs.shape[0] == 0:
                # dead branch: copy the parent's center into every child so
                # descent stays well-defined (these words never fire)
                if level > 0:
                    centers_l[p * K:(p + 1) * K] = levels[level - 1][p]
                continue
            c, a = kmajority(Xs, K, rng)
            centers_l[p * K:(p + 1) * K] = c
            new_node[sel] = p * K + a
        node_of = new_node
        levels.append(centers_l)
        print(f"level {level + 1}: {n_parents * K} nodes trained", flush=True)
    return np.concatenate(levels, axis=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "fishbirdeyevisualslam_tpu", "data", "orb_vocab.npz"))
    ap.add_argument("--worlds", type=int, default=6)
    ap.add_argument("--frames", type=int, default=14)
    ap.add_argument("--max-desc", type=int, default=300000)
    a = ap.parse_args()

    t0 = time.time()
    bits, doc_ids = collect_corpus(a.worlds, a.frames)
    rng = np.random.RandomState(0)
    if bits.shape[0] > a.max_desc:
        sel = rng.choice(bits.shape[0], a.max_desc, replace=False)
        bits, doc_ids = bits[sel], doc_ids[sel]
    print(f"corpus: {bits.shape[0]} descriptors, {doc_ids.max() + 1} documents "
          f"({time.time() - t0:.0f}s)", flush=True)

    centers = train_tree(bits, rng)
    pm1 = centers.astype(np.float32) * 2.0 - 1.0
    words = vocab.descend_np(bits, pm1)

    # idf over training documents (DBoW2's TF_IDF weighting)
    n_docs = int(doc_ids.max()) + 1
    df = np.zeros(vocab.N_WORDS, np.int64)
    # document frequency: unique (word, doc) pairs
    pair = words.astype(np.int64) * n_docs + doc_ids
    uw = np.unique(pair) // n_docs
    np.add.at(df, uw.astype(np.int64), 1)
    idf = np.log(n_docs / np.maximum(df, 1)).astype(np.float32)

    used = (df > 0).sum()
    print(f"vocabulary: {used}/{vocab.N_WORDS} words used in training; "
          f"mean df {df[df > 0].mean():.1f}", flush=True)

    # pack bits (256 -> 8 uint32, same layout as ops.orb.pack_bits)
    b = centers.reshape(-1, 8, 32).astype(np.uint32)
    packed = (b << np.arange(32, dtype=np.uint32)[None, None, :]).sum(-1, dtype=np.uint32)
    os.makedirs(os.path.dirname(a.out), exist_ok=True)
    np.savez_compressed(a.out, centers_packed=packed, idf=idf)
    print(f"wrote {a.out} ({time.time() - t0:.0f}s total)", flush=True)


if __name__ == "__main__":
    main()
