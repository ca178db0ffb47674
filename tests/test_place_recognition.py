import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fishbirdeyevisualslam_tpu.config import DEFAULT_CONFIG
from fishbirdeyevisualslam_tpu.geometry import se3, sim3, camera
from fishbirdeyevisualslam_tpu.ops import bow, orb
from fishbirdeyevisualslam_tpu.solvers.sim3_solver import horn_alignment, ransac_sim3
from fishbirdeyevisualslam_tpu.solvers.pnp import ransac_pnp

CAM = DEFAULT_CONFIG.camera
KEY = jax.random.PRNGKey(3)


def rand_bits(rng, n):
    return jnp.asarray(rng.randint(0, 2, (n, 256)).astype(np.uint8))


def flip_bits(rng, bits, p):
    noise = rng.rand(*bits.shape) < p
    return jnp.asarray(np.asarray(bits) ^ noise.astype(np.uint8))


def vocab_like_bits(rng, n):
    """Descriptors drawn near the trained vocabulary's leaf centers — the
    in-distribution proxy for real ORB descriptors (random 256-bit vectors are
    far from every center and quantize arbitrarily, which is also how DBoW2
    behaves on noise)."""
    from fishbirdeyevisualslam_tpu.ops import vocab as vocab_mod
    v = vocab_mod.load_vocabulary()
    leaves = np.asarray(v.centers_pm1[-vocab_mod.N_WORDS:], np.float32) > 0
    pick = rng.choice(vocab_mod.N_WORDS, n, replace=False)
    return jnp.asarray(leaves[pick].astype(np.uint8))


class TestBow:
    def test_similar_descriptors_same_word(self):
        rng = np.random.RandomState(0)
        bits = vocab_like_bits(rng, 200)
        near = flip_bits(rng, bits, 0.02)  # 2% bit flips (~5 bits)
        w1 = np.asarray(bow.word_ids(orb.bits_to_pm1(bits)))
        w2 = np.asarray(bow.word_ids(orb.bits_to_pm1(near)))
        same = (w1 == w2).mean()
        assert same > 0.5, same
        # unrelated descriptors almost never collide
        other = vocab_like_bits(np.random.RandomState(1), 200)
        w3 = np.asarray(bow.word_ids(orb.bits_to_pm1(other)))
        assert (w1 == w3).mean() < 0.05

    def test_scoring_ranks_same_place_first(self):
        rng = np.random.RandomState(2)
        F, K = 128, 6
        base = [vocab_like_bits(np.random.RandomState(20 + i), F) for i in range(K)]
        kf_words = jnp.stack([bow.word_ids(orb.bits_to_pm1(b)) for b in base])
        kf_valid = jnp.ones((K, F), bool)
        # query = noisy copy of KF 3
        q_bits = flip_bits(rng, base[3], 0.03)
        q_words = bow.word_ids(orb.bits_to_pm1(q_bits))
        scores = np.asarray(bow.score_against_keyframes(
            q_words, jnp.ones(F, bool), kf_words, kf_valid))
        assert scores.argmax() == 3
        assert scores[3] > 2 * np.delete(scores, 3).max()

    def test_node_gate(self):
        rng = np.random.RandomState(4)
        bits = vocab_like_bits(rng, 50)
        near = flip_bits(rng, bits, 0.02)
        wa = bow.word_ids(orb.bits_to_pm1(bits))
        wb = bow.word_ids(orb.bits_to_pm1(near))
        m = np.asarray(bow.node_gate_mask(wa, jnp.ones(50, bool), wb, jnp.ones(50, bool)))
        # diagonal (true correspondences) mostly allowed
        assert np.diag(m).mean() > 0.6


class TestSim3:
    def test_horn_exact(self):
        rng = np.random.RandomState(5)
        p2 = jnp.asarray(rng.randn(30, 3).astype(np.float32) * 5)
        T = se3.random_pose(KEY, 0.5, 3.0)
        p1 = se3.transform(T, p2)
        S = horn_alignment(p1, p2, fix_scale=True)
        np.testing.assert_allclose(np.asarray(sim3.transform(S, p2)), np.asarray(p1), atol=1e-3)

    def test_horn_with_scale(self):
        rng = np.random.RandomState(6)
        p2 = jnp.asarray(rng.randn(30, 3).astype(np.float32) * 5)
        T = se3.random_pose(jax.random.fold_in(KEY, 1), 0.5, 3.0)
        p1 = 1.8 * se3.transform(T, p2) + 0.0
        # note: p1 = 1.8*(R p2 + t) = (1.8 R) p2 + 1.8 t -> scale 1.8
        S = horn_alignment(p1, p2, fix_scale=False)
        assert abs(float(sim3.scale(S)) - 1.8) < 0.05

    def test_ransac_with_outliers(self):
        rng = np.random.RandomState(7)
        n = 100
        p2 = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 5)
        T = se3.random_pose(jax.random.fold_in(KEY, 2), 0.4, 2.0)
        p1 = np.array(se3.transform(T, p2))
        p1[:30] += rng.uniform(2, 10, (30, 3))  # 30% outliers
        out = ransac_sim3(jnp.asarray(p1), p2, jnp.ones(n, bool), jax.random.PRNGKey(8))
        assert bool(out.success)
        inl = np.asarray(out.inliers)
        assert not inl[:30].any()
        assert inl[30:].mean() > 0.95


class TestPnP:
    def test_recovers_pose_with_outliers(self):
        rng = np.random.RandomState(9)
        n = 150
        Xw = jnp.asarray(np.stack([
            rng.uniform(-8, 8, n), rng.uniform(-4, 4, n), rng.uniform(8, 30, n)
        ], -1).astype(np.float32))
        T = se3.random_pose(jax.random.fold_in(KEY, 3), 0.2, 1.0)
        uv = np.array(camera.project_pinhole(CAM, se3.transform(T, Xw)))
        uv += rng.randn(n, 2) * 0.3
        uv[:30] = rng.uniform(0, 900, (30, 2))
        out = ransac_pnp(CAM, Xw, jnp.asarray(uv.astype(np.float32)),
                         jnp.ones(n, bool), jax.random.PRNGKey(10))
        assert bool(out.success)
        err = np.abs(np.asarray(se3.log(se3.compose(out.Tcw, se3.inverse(T)))))
        assert err.max() < 0.05, err  # refined later by pose opt in the pipeline
        inl = np.asarray(out.inliers)
        assert inl[30:].mean() > 0.8


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
