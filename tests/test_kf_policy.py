"""NeedNewKeyFrame decision table (``Tracking::NeedNewKeyFrame``,
``src/Tracking.cc:1444-1540``): the c1a/c1b/c2 conditions, the
post-relocalization refusal window, and the InterruptBA request when mapping
is busy (mono semantics: no insertion while busy)."""
import pytest

from fishbirdeyevisualslam_tpu.config import SystemConfig
from fishbirdeyevisualslam_tpu.slam.tracking import need_new_keyframe

CFG = SystemConfig()  # max_frames_between_kf=25, min_frames_between_kf=0

BASE = dict(localization_only=False, n_kfs=10, frame_id=100,
            last_kf_frame_id=90, last_reloc_frame_id=-10000,
            n_inliers=50, n_ref_matches=100, mapping_idle=True)


def case(**over):
    kw = dict(BASE)
    kw.update(over)
    return need_new_keyframe(CFG, **kw)


class TestDecisionTable:
    def test_c1b_c2_insert_when_idle(self):
        # inliers 50 < 0.9*100 and > 15, min-frames elapsed, idle -> insert
        assert case() == (True, False)

    def test_localization_only_refuses(self):
        assert case(localization_only=True) == (False, False)

    def test_reloc_window_refuses_on_mature_map(self):
        # within mMaxFrames of a relocalization AND nKFs > mMaxFrames -> false
        assert case(last_reloc_frame_id=95, n_kfs=30) == (False, False)

    def test_reloc_window_ignored_on_small_map(self):
        # same window but nKFs <= mMaxFrames: the refusal does not apply
        assert case(last_reloc_frame_id=95, n_kfs=10) == (True, False)

    def test_c2_requires_tracking_weaker_than_ref(self):
        # inliers >= 0.9 * nRefMatches -> c2 false -> no KF even with c1a
        assert case(n_inliers=95, last_kf_frame_id=0) == (False, False)

    def test_c2_requires_min_inliers(self):
        # very weak tracking (<= 15 inliers) never inserts
        assert case(n_inliers=15) == (False, False)

    def test_c1a_forces_after_max_frames_even_when_busy_requests_interrupt(self):
        # mMaxFrames elapsed, c2 holds, mapping busy -> mono: request
        # InterruptBA, do NOT insert (Tracking.cc:1522-1538)
        assert case(last_kf_frame_id=100 - 26, mapping_idle=False) == (False, True)

    def test_busy_without_elapsed_frames_no_interrupt(self):
        # mapping busy, c1b false (needs idle), c1a false -> nothing
        assert case(mapping_idle=False, last_kf_frame_id=99) == (False, False)

    def test_recent_kf_with_min_frames_gap(self):
        # a KF inserted THIS frame id: c1b needs at least one frame elapsed
        assert case(last_kf_frame_id=100) == (False, False)

    def test_bird_trigger_is_computed_but_not_ored(self):
        # b1 true (bird starving) but c2 false: the reference does NOT insert
        # (Tracking.cc:1508 computes b1 and leaves it out of the decision)
        assert case(n_inliers=95, n_bird_matched=1, n_ref_bird=100,
                    last_kf_frame_id=0) == (False, False)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
