"""Constraint-priority landmark compaction for local BA
(tracking._priority_packed_select, r5).

The r5 soak measured 9553 in-window bird landmarks vs the 4096 compaction cap;
index-ordered packing clipped an arbitrary subset.  These tests pin the
priority order: center-KF-observed landmarks survive clipping first, then the
most locally-observed, and under-cap windows select everything in-window."""

import jax.numpy as jnp
import numpy as np

from fishbirdeyevisualslam_tpu.slam.tracking import _priority_packed_select


def run(in_mask, n_lobs, center_obs, cap):
    sel, val = _priority_packed_select(
        jnp.asarray(in_mask), jnp.asarray(n_lobs, jnp.int32),
        jnp.asarray(center_obs), cap)
    return np.asarray(sel), np.asarray(val)


class TestPrioritySelect:
    def test_under_cap_selects_all(self):
        N = 32
        rng = np.random.RandomState(0)
        in_mask = rng.rand(N) < 0.4
        sel, val = run(in_mask, rng.randint(1, 5, N), rng.rand(N) < 0.5, 16)
        picked = set(sel[val].tolist())
        assert picked == set(np.nonzero(in_mask)[0].tolist())
        assert val.sum() == in_mask.sum()

    def test_center_observed_survive_clipping(self):
        # 24 in-window, cap 8: the 6 center-observed must all be kept
        N = 64
        in_mask = np.zeros(N, bool)
        in_mask[10:34] = True
        center = np.zeros(N, bool)
        center[[11, 15, 20, 25, 30, 33]] = True
        n_lobs = np.where(in_mask, 1, 0)
        sel, val = run(in_mask, n_lobs, center, 8)
        picked = set(sel[val].tolist())
        assert set([11, 15, 20, 25, 30, 33]) <= picked
        assert len(picked) == 8

    def test_more_local_obs_preferred(self):
        # no center obs; cap 4 of 12 in-window: the 4 highest-obs win
        N = 32
        in_mask = np.zeros(N, bool)
        in_mask[:12] = True
        n_lobs = np.zeros(N, int)
        n_lobs[:12] = [1, 2, 9, 1, 8, 1, 1, 7, 1, 1, 6, 1]
        sel, val = run(in_mask, n_lobs, np.zeros(N, bool), 4)
        assert set(sel[val].tolist()) == {2, 4, 7, 10}

    def test_empty_window(self):
        N = 16
        sel, val = run(np.zeros(N, bool), np.zeros(N, int),
                       np.zeros(N, bool), 4)
        assert not val.any()

    def test_padding_rows_marked_invalid(self):
        # 2 in-window, cap 4: exactly 2 valid rows
        N = 16
        in_mask = np.zeros(N, bool)
        in_mask[[5, 9]] = True
        n_lobs = np.where(in_mask, 3, 0)
        sel, val = run(in_mask, n_lobs, np.zeros(N, bool), 4)
        assert val.sum() == 2
        assert set(sel[val].tolist()) == {5, 9}
