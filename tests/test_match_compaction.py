"""Candidate compaction for the fused matchers (tracking._compact_fused_match).

The kernel itself only runs on TPU; these tests pin the compaction HARNESS on
CPU with mock kernels: index remapping, the overflow fallback cond, and
result equivalence between the compact and full paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fishbirdeyevisualslam_tpu.ops import matcher
from fishbirdeyevisualslam_tpu.slam.tracking import _compact_fused_match


def brute_match(desc_a, desc_b, vis):
    """Reference: nearest visible target per query by |da - db|."""
    d = np.abs(desc_a[:, None] - desc_b[None, :]).astype(np.float32)
    d = np.where(vis[None, :], d, 1e9)
    idx = d.argmin(1)
    best = d[np.arange(len(desc_a)), idx]
    ok = best < 1e9
    return np.where(ok, idx, -1), np.where(ok, best, matcher.BIG), ok


def make_runs(desc_a, desc_b):
    def run_compact(sel, mask):
        db = desc_b[sel]
        d = jnp.abs(desc_a[:, None] - db[None, :])
        d = jnp.where(mask[None, :], d, 1e9)
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        best = d[jnp.arange(desc_a.shape[0]), idx]
        ok = best < 1e9
        return matcher.MatchResult(jnp.where(ok, idx, -1),
                                   jnp.where(ok, best, matcher.BIG), ok)

    def run_full(_):
        vis_f = make_runs.vis
        d = jnp.abs(desc_a[:, None] - desc_b[None, :])
        d = jnp.where(vis_f[None, :], d, 1e9)
        idx = jnp.argmin(d, axis=1).astype(jnp.int32)
        best = d[jnp.arange(desc_a.shape[0]), idx]
        ok = best < 1e9
        return matcher.MatchResult(jnp.where(ok, idx, -1),
                                   jnp.where(ok, best, matcher.BIG), ok)

    return run_compact, run_full


class TestCompaction:
    def _case(self, n_vis, cap):
        rng = np.random.RandomState(0)
        Na, Nb = 32, 128
        desc_a = jnp.asarray(rng.rand(Na).astype(np.float32))
        desc_b = jnp.asarray(rng.rand(Nb).astype(np.float32))
        vis = np.zeros(Nb, bool)
        vis[rng.choice(Nb, n_vis, replace=False)] = True
        make_runs.vis = jnp.asarray(vis)
        run_compact, run_full = make_runs(desc_a, desc_b)
        res = _compact_fused_match(jnp.asarray(vis), cap, run_compact, run_full)
        ref_idx, ref_dist, ref_ok = brute_match(
            np.asarray(desc_a), np.asarray(desc_b), vis)
        np.testing.assert_array_equal(np.asarray(res.idx), ref_idx)
        np.testing.assert_allclose(np.asarray(res.dist), ref_dist, rtol=1e-6)

    def test_compact_path_remaps_to_full_ids(self):
        self._case(n_vis=20, cap=64)

    def test_overflow_falls_back_to_full(self):
        self._case(n_vis=100, cap=64)

    def test_exact_fit(self):
        self._case(n_vis=64, cap=64)

    def test_no_visible(self):
        rng = np.random.RandomState(1)
        desc_a = jnp.asarray(rng.rand(8).astype(np.float32))
        desc_b = jnp.asarray(rng.rand(32).astype(np.float32))
        vis = np.zeros(32, bool)
        make_runs.vis = jnp.asarray(vis)
        run_compact, run_full = make_runs(desc_a, desc_b)
        res = _compact_fused_match(jnp.asarray(vis), 16, run_compact, run_full)
        assert (np.asarray(res.idx) == -1).all()


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
